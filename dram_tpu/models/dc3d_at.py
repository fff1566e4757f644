"""DC3DATGeneric: DC3D backbone + detached attention taps + PCM refinement.

Rebuild of the reference DC3DATGeneric (reference models.py:415-597): the
U-Net runs as usual; selected layers (`at_layers`, -1 meaning the raw input)
are tapped, passed through 1x1x1 conv+BN+ReLU `reshape` heads on
stop-gradient'ed features (models.py:563-565), trilinearly resized to
`at_spatial_size` and concatenated into the attention feature map; the dense
CAM is resized to the attention grid, refined by the PCM stencil attention,
and resized back. Returns (dense_outs, refined_dense_outs).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import ops
from ..core.resample import resize3d
from .pcm import PCM
from .unet3d import DC3D


class DC3DATGeneric(nn.Module):
    n_layers: int = 3
    in_ch_list: Sequence[int] = (1, 64, 128, 256, 768, 384, 192)
    base_ch_list: Sequence[int] = (32, 64, 128, 256, 256, 128, 64)
    end_ch_list: Sequence[int] = (64, 128, 256, 512, 256, 128, 64)
    out_ch: int = 1
    padding_list: Sequence[Any] = ((1, 1),) * 7
    checkpoint_layers: Sequence[int] = (0, 1, 0, 1, 0, 1, 0)
    dropout: float = 0.0
    at_spatial_size: Sequence[int] = (64, 64, 64)
    at_f_dim: int = 8
    at_g_dim: int = 8
    at_p_enc_dim: int = 0
    at_geo_f_dim: int = 0
    at_g_iter: int = 1
    at_k_size: int = 3
    at_merge_type: str = "scaled_dot_product_relu"
    at_self_loop: bool = False
    at_layers: Sequence[int] = (-1, 0, 1)
    at_connectivity: int = 2
    upsample_ksize: Any = 3
    upsample_sf: Any = 2
    kernel_sizes: Optional[Sequence[Any]] = None
    stacking: int = 3
    norm_method: str = "bn"
    act_method: str = "relu"
    pooling_method: str = "avg"
    out_cls_ch: int = 6
    train: bool = True
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    use_pallas_attention: bool = False
    use_pallas_conv: bool = False
    use_fused_stack: bool = False
    fused_interpret: bool = False
    fused_cm: bool = True

    def setup(self):
        self.backbone = DC3D(
            n_layers=self.n_layers, in_ch_list=self.in_ch_list,
            base_ch_list=self.base_ch_list, end_ch_list=self.end_ch_list,
            out_ch=self.out_ch, padding_list=self.padding_list,
            checkpoint_layers=self.checkpoint_layers, dropout=self.dropout,
            upsample_ksize=self.upsample_ksize, upsample_sf=self.upsample_sf,
            kernel_sizes=self.kernel_sizes, stacking=self.stacking,
            use_pallas_conv=self.use_pallas_conv,
            use_fused_stack=self.use_fused_stack,
            fused_interpret=self.fused_interpret,
            fused_cm=self.fused_cm,
            norm_method=self.norm_method, act_method=self.act_method,
            pooling_method=self.pooling_method, out_cls_ch=self.out_cls_ch,
            train=self.train, dtype=self.dtype, axis_name=self.axis_name)

        n_taps = len([l for l in self.at_layers if l != -1])
        self.reshape_heads = [
            _ReshapeHead(self.at_f_dim, self.train, self.dtype, name=f"reshape_{i}")
            for i in range(n_taps)]
        self.attention_module = PCM(
            pool_size=tuple(self.at_spatial_size),
            g_ch=self.out_ch, f_dim=self.at_f_dim,
            geo_f_dim=self.at_geo_f_dim, g_dim=self.at_g_dim,
            non_local_iter=self.at_g_iter, k_size=self.at_k_size,
            merge_type=self.at_merge_type, self_loop=self.at_self_loop,
            connectivity=self.at_connectivity, p_enc_dim=self.at_p_enc_dim,
            dtype=self.dtype,
            use_pallas=self.use_pallas_attention,
            name="attention_module")

    def apply_attention(self, dense_out, attention_features):
        raw_size = dense_out.shape[1:4]
        cam = resize3d(dense_out, tuple(self.at_spatial_size),
                       method="trilinear", align_corners=True)
        refined = self.attention_module(cam, attention_features)
        return resize3d(refined, raw_size, method="trilinear",
                        align_corners=True).astype(jnp.float32)

    def compute_features(self, x):
        """U-Net trunk + tap heads: (dense logits, PCM input features).

        Split out of __call__ so parity harnesses can check the exact
        pre-PCM tensors against a literal torch oracle
        (tests/test_reference_parity.py)."""
        x = x.astype(self.dtype)
        taps = []
        nc = 0
        if -1 in self.at_layers:
            taps.append(x)

        feats, h = self.backbone.encoder(x)
        for idx, f in enumerate(feats):
            if idx in self.at_layers:
                taps.append(self.reshape_heads[nc](jax.lax.stop_gradient(f)))
                nc += 1
        xbg = self.backbone.bottleneck(h)
        if self.n_layers in self.at_layers:
            taps.append(self.reshape_heads[nc](jax.lax.stop_gradient(xbg)))
            nc += 1
        us_feats = self.backbone.decoder(xbg, feats)
        for idx in range(1, len(us_feats)):
            if (self.n_layers + idx) in self.at_layers:
                taps.append(self.reshape_heads[nc](
                    jax.lax.stop_gradient(us_feats[idx])))
                nc += 1

        dense_outs = self.backbone.top(us_feats[-1], x.shape[1:4])

        at_size = tuple(self.at_spatial_size)
        taps = [resize3d(t, at_size, method="trilinear", align_corners=True)
                for t in taps]
        attention_features = jnp.concatenate(taps, axis=-1)
        return dense_outs, attention_features

    def __call__(self, x, lungs=None):
        dense_outs, attention_features = self.compute_features(x)
        refined_dense_outs = self.apply_attention(dense_outs, attention_features)
        return dense_outs, refined_dense_outs

    def pooling_dense_features(self, dense_outs, lungs, pooling_method=None):
        return ops.pooling_dense_features(
            dense_outs, lungs, pooling_method or self.pooling_method)


class _ReshapeHead(nn.Module):
    """1x1x1 conv + BN + ReLU tap head (reference models.py:488-494).

    Accepts NDHWC or cm-resident (CM) features: the channel-reducing 1x1
    conv runs layout-native, so tapping a cm-resident encoder feature
    transposes only the small f_dim-channel result."""

    features: int
    train: bool
    dtype: Any

    @nn.compact
    def __call__(self, x):
        from ..core.pallas.cm import as_ndhwc
        from .blocks import Conv1x1
        x = as_ndhwc(Conv1x1(self.features, use_bias=True,
                             dtype=self.dtype, name="conv")(x))
        x = nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)
