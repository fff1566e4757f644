"""DC3D: 3-level 3-D U-Net dense-regression backbone (flax.linen, NDHWC).

TPU-native rebuild of the reference DC3D (reference models.py:52-147):
encoder of ConvPool blocks, bottleneck, decoder of upsample-concat blocks
with early exit at `stacking`, 1x1x1 top layer, trilinear resize back to
input resolution, returning the dense logits twice (the plain model has no
separate refinement head).

Rematerialisation: the reference checkpoints layers by a 0/1 mask
(models.py:123-143, mask [0,1,0,1,0,1,0] in the shipped configs); here the
same mask selects which blocks are wrapped in nn.remat (jax.checkpoint).

Inputs are (B, D, H, W, 1) windowed chunks; `lungs` is accepted for API
parity (pooling uses it, the forward pass does not). Submodules are defined
in setup() so that DC3DATGeneric can drive encoder/bottleneck/decoder
stages individually for its attention taps.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..core import ops
from ..core.resample import resize3d
from .blocks import Conv1x1, ConvBlock5d, ConvPoolBlock5d, UpsampleConvBlock5d


def _block_cls(cls, remat):
    return nn.remat(cls) if remat else cls


class DC3D(nn.Module):
    n_layers: int = 3
    in_ch_list: Sequence[int] = (1, 64, 128, 256, 768, 384, 192)
    base_ch_list: Sequence[int] = (32, 64, 128, 256, 256, 128, 64)
    end_ch_list: Sequence[int] = (64, 128, 256, 512, 256, 128, 64)
    out_ch: int = 1
    padding_list: Sequence[Any] = ((1, 1),) * 7
    checkpoint_layers: Sequence[int] = (0, 1, 0, 1, 0, 1, 0)
    dropout: float = 0.0
    upsample_ksize: Any = 3
    upsample_sf: Any = 2
    kernel_sizes: Optional[Sequence[Any]] = None
    stacking: int = 0
    norm_method: str = "bn"
    act_method: str = "relu"
    pooling_method: str = "avg"
    out_cls_ch: int = 6
    train: bool = True
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    # strictly local 2x upsampling (exact overlap-tile spatial sharding);
    # False keeps reference align-corners parity
    local_upsample: bool = False
    # fused Pallas conv3d on supported shapes (TPU; same param tree)
    use_pallas_conv: bool = False
    # fully fused conv->bn->relu->conv chain (TPU single-chip; same tree)
    use_fused_stack: bool = False
    fused_interpret: bool = False
    # keep activations in the fused kernel's (B, D, C, M) layout BETWEEN
    # stacks (pool/upsample/concat/top run layout-native; cm.py) — only
    # meaningful with use_fused_stack
    fused_cm: bool = True

    def setup(self):
        ks = (list(self.kernel_sizes) if self.kernel_sizes is not None
              else [(3, 3)] * (self.n_layers * 2 + 1))
        conv_bias = self.norm_method is None
        common = dict(use_bias=conv_bias, norm_method=self.norm_method,
                      act_method=self.act_method, dropout=self.dropout,
                      train=self.train, dtype=self.dtype,
                      axis_name=self.axis_name,
                      use_pallas_conv=self.use_pallas_conv,
                      use_fused_stack=self.use_fused_stack,
                      fused_interpret=self.fused_interpret,
                      fused_cm=self.use_fused_stack and self.fused_cm)

        self.ds_modules = [
            _block_cls(ConvPoolBlock5d, self.checkpoint_layers[i] > 0)(
                features=(self.base_ch_list[i], self.end_ch_list[i]),
                kernel_size=ks[i], padding=self.padding_list[i],
                name=f"ds_{i}", **common)
            for i in range(self.n_layers)
        ]
        n = self.n_layers
        self.bg = _block_cls(ConvBlock5d, self.checkpoint_layers[n] > 0)(
            features=(self.base_ch_list[n], self.end_ch_list[n]),
            kernel_size=ks[n], padding=self.padding_list[n],
            name="bg", **common)
        self.us_modules = [
            _block_cls(UpsampleConvBlock5d,
                       self.checkpoint_layers[n + 1 + i] > 0)(
                features=(self.base_ch_list[n + 1 + i],
                          self.end_ch_list[n + 1 + i]),
                scale_factor=self.upsample_sf,
                kernel_size=ks[n + 1 + i], padding=self.padding_list[n + 1 + i],
                local_upsample=self.local_upsample,
                name=f"us_{i}", **common)
            for i in range(self.n_layers)
        ]
        # Conv1x1 == nn.Conv(1x1x1, VALID) numerically and tree-wise, but
        # also consumes cm-resident decoder features without a transpose
        self.top_layer = Conv1x1(features=self.out_ch, use_bias=True,
                                 dtype=self.dtype, name="top_layer")

    def encoder(self, x):
        """Run encoder; returns (pre-pool feature list, pooled output)."""
        feats = []
        h = x
        for ds in self.ds_modules:
            f, h = ds(h)
            feats.append(f)
        return feats, h

    def bottleneck(self, h):
        return self.bg(h)

    def decoder(self, xbg, feats):
        """Returns the list of decoder features (entry 0 = bottleneck)."""
        us_feats = [xbg]
        for i, (us, skip) in enumerate(zip(self.us_modules, reversed(feats))):
            if self.stacking == i:
                break
            us_feats.append(us(us_feats[-1], skip))
        return us_feats

    def top(self, outs, spatial_size):
        from ..core.pallas.cm import as_ndhwc
        dense = as_ndhwc(self.top_layer(outs))
        dense = resize3d(dense, spatial_size, method="trilinear",
                         align_corners=True)
        return dense.astype(jnp.float32)

    def __call__(self, x, lungs=None):
        x = x.astype(self.dtype)
        feats, h = self.encoder(x)
        xbg = self.bottleneck(h)
        us_feats = self.decoder(xbg, feats)
        dense = self.top(us_feats[-1], x.shape[1:4])
        return dense, dense

    def pooling_dense_features(self, dense_outs, lungs, pooling_method=None):
        return ops.pooling_dense_features(
            dense_outs, lungs, pooling_method or self.pooling_method)
