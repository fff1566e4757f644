"""3-D conv building blocks (flax.linen, NDHWC, bf16-friendly).

TPU-native equivalents of the reference conv stacks (reference parts.py:
ConvBlock5d :66-113, UpsampleConvBlock5d :116-155, ConvPoolBlock5d :157-196,
normal_wrapper :17-35, crop_concat_5d :37-46). Differences by design:

* channels-last NDHWC layout (XLA tiles 3-D convs onto the MXU best this way)
* trilinear upsampling is the shared separable-matrix resize (core.resample),
  align_corners=True to match the reference's nn.Upsample
* 'sbn' (SyncBatchNorm) needs no special layer: under pjit with the batch
  axis sharded, batch-stat reductions are already global (XLA inserts the
  cross-replica collectives); an optional axis_name covers shard_map/pmap use
* mixed precision: `dtype` controls activation/compute dtype, params stay f32
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .initializers import kaiming_normal_conv
from jax.nn.initializers import constant

Dtype = Any


def make_norm(norm_method, dtype=jnp.float32, axis_name=None):
    """String -> norm layer factory. Mirrors reference normal_wrapper:

    bn    BatchNorm with running stats
    bnt   BatchNorm, no running stats (batch stats also in eval)
    bntna BatchNorm, no running stats, no affine
    ln    GroupNorm(1) (a.k.a. layer norm over C,D,H,W)
    lnna  GroupNorm(1) without affine
    in    InstanceNorm (GroupNorm with one group per channel)
    sbn   cross-replica BatchNorm (axis_name'd when under shard_map/pmap)
    None  identity
    """
    def build(use_running_average):
        if norm_method in ("bn", "sbn"):
            # 'bn' also takes the axis_name: under GSPMD jit (axis_name
            # None) batch-stat reductions are already global; under
            # shard_map the explicit pmean keeps the SAME global-batch
            # semantics, so switching execution models never changes stats
            return nn.BatchNorm(use_running_average=use_running_average,
                                momentum=0.9, epsilon=1e-5, dtype=dtype,
                                axis_name=axis_name)
        if norm_method == "bnt":
            return nn.BatchNorm(use_running_average=False, momentum=0.9,
                                epsilon=1e-5, dtype=dtype)
        if norm_method == "bntna":
            return nn.BatchNorm(use_running_average=False, momentum=0.9,
                                epsilon=1e-5, use_bias=False, use_scale=False,
                                dtype=dtype)
        if norm_method == "ln":
            return nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=dtype)
        if norm_method == "lnna":
            return nn.GroupNorm(num_groups=1, epsilon=1e-5, use_bias=False,
                                use_scale=False, dtype=dtype)
        if norm_method == "in":
            return nn.GroupNorm(group_size=1, epsilon=1e-5, dtype=dtype)
        if norm_method is None or norm_method == "none":
            return None
        raise NotImplementedError(f"norm method {norm_method}")
    return build


def make_act(act_method):
    if act_method == "relu":
        return nn.relu
    if act_method == "prelu":
        return nn.PReLU()
    raise NotImplementedError(f"act method {act_method}")


def crop_concat(t1, t2):
    """Center-crop skip tensor t2 to t1's spatial size, concat channels.

    NDHWC version of reference crop_concat_5d (parts.py:37-46): t1 is the
    upsampled decoder tensor, t2 the encoder skip (t1 <= t2 spatially).
    """
    assert t1.ndim == t2.ndim == 5
    slices = [slice(None)]
    for a, b in zip(t1.shape[1:4], t2.shape[1:4]):
        start = int(np.ceil((b - a) / 2))
        slices.append(slice(start, start + a))
    slices.append(slice(None))
    return jnp.concatenate([t1, t2[tuple(slices)]], axis=-1)


def _as_list(v, n):
    if isinstance(v, (tuple, list)):
        return list(v)
    return [v] * n


class PallasConv3d(nn.Module):
    """Drop-in for nn.Conv on the k=3^3 / stride-1 / SAME configuration:
    identical parameter tree (kernel [, bias]), but the convolution runs on
    the fused Pallas kernel (core/pallas/conv3d.py) — checkpoints swap
    freely between the XLA and Pallas paths."""

    features: int
    use_bias: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..core.pallas.conv3d import conv3d_pallas
        ci = x.shape[-1]
        kernel = self.param("kernel", kaiming_normal_conv,
                            (3, 3, 3, ci, self.features), jnp.float32)
        y = conv3d_pallas(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", constant(0.01), (self.features,),
                              jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


class Conv1x1(nn.Module):
    """1x1x1 convolution with nn.Conv's exact parameter tree
    ({kernel (1,1,1,Ci,Co) [, bias]}, lecun_normal/zeros inits) that runs
    on either an NDHWC array or a CM kernel-layout activation — so the
    top layer / tap heads can consume cm-resident features without a
    layout round trip. Numerics match nn.Conv (inputs and kernel promoted
    to `dtype`, a single dot over the channel axis)."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..core.pallas.cm import CM, conv1x1_cm
        ci = x.data.shape[2] if isinstance(x, CM) else x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, 1, ci, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32) \
            if self.use_bias else None
        if isinstance(x, CM):
            return conv1x1_cm(x, kernel, bias, self.dtype)
        k = kernel.reshape(ci, self.features).astype(self.dtype)
        y = jnp.einsum("...i,io->...o", x.astype(self.dtype), k)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class _ConvKernel(nn.Module):
    """Parameter-only scope matching nn.Conv's tree ({name}/kernel) for the
    fused-stack path — checkpoints swap freely with the unfused modules."""

    shape: Sequence[int]

    @nn.compact
    def __call__(self):
        return self.param("kernel", kaiming_normal_conv, tuple(self.shape),
                          jnp.float32)


class _BNState(nn.Module):
    """Parameter/variable scope matching nn.BatchNorm's tree
    ({name}/{scale,bias} + batch_stats {name}/{mean,var})."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.features,), jnp.float32))
        return scale, bias, mean, var


class ConvStack(nn.Module):
    """N x (Conv3d -> norm -> act [-> dropout]) shared by all blocks.

    With `use_fused_stack` (TPU), the 2-conv bn/relu configuration runs as
    ONE fused Pallas chain (core/pallas/fused_stack.py): activations stay
    in the kernel layout, BN stats accumulate in the conv epilogue and the
    BN affine+ReLU applies in the next conv's prologue — no HBM round
    trips between the convolutions. Parameter tree and checkpoints are
    identical to the unfused path. Under shard_map data parallelism
    (`axis_name` set) the fused BatchNorm psums its epilogue stats over
    the batch axes, so batch statistics are global — exact on any device
    count.
    """

    features: Sequence[int]
    kernel_sizes: Sequence[int]
    paddings: Sequence[int]
    strides: Sequence[int]
    use_bias: bool
    norm_method: str | None = "bn"
    act_method: str = "relu"
    dropout: float = 0.0
    train: bool = True
    dtype: Dtype = jnp.float32
    axis_name: str | None = None
    use_pallas_conv: bool = False
    use_fused_stack: bool = False
    fused_interpret: bool = False
    # emit the fused chain's output in the CM kernel layout (the parent
    # block keeps pool/upsample/concat cm-resident; core/pallas/cm.py)
    cm_out: bool = False

    def _fused(self, x, chain_fn, cm_capable):
        from ..core.pallas.cm import CM
        if isinstance(x, (tuple, list)):
            # virtual concat: the parts stream straight into the fused
            # kernel's patch columns (fused_stack.conv_cm) — the decoder's
            # upsample+skip concatenation never materializes in HBM
            ci = sum(p.data.shape[2] for p in x)
            x = tuple(x)
        elif isinstance(x, CM):
            ci = x.data.shape[2]
        else:
            ci = x.shape[-1]
            x = x.astype(self.dtype)
        f0, f1 = self.features
        w0 = _ConvKernel((3, 3, 3, ci, f0), name="conv_0")()
        g0, b0, m0, v0 = _BNState(f0, name="BatchNorm_0")()
        w1 = _ConvKernel((3, 3, 3, f0, f1), name="conv_1")()
        g1, b1, m1, v1 = _BNState(f1, name="BatchNorm_1")()
        if ci < 8 and not isinstance(x, (CM, tuple)):
            # network-entry stack (Ci=1): zero-pad input channels to the
            # kernel's sublane floor so the WHOLE stack runs fused (the
            # XLA first conv costs ~19 ms/step in NDHWC copies + BN
            # passes; zeros contribute nothing to the conv and jnp.pad
            # backprops as a slice)
            x = jnp.pad(x, [(0, 0)] * 4 + [(0, 8 - ci)])
            w0 = jnp.pad(w0, [(0, 0)] * 3 + [(0, 8 - ci), (0, 0)])
        y, (nm0, nv0, nm1, nv1) = chain_fn(
            x, w0, g0, b0, m0.value, v0.value,
            w1, g1, b1, m1.value, v1.value,
            train=self.train, interpret=self.fused_interpret,
            cm_out=self.cm_out and cm_capable, axis_name=self.axis_name)
        if self.train and not self.is_initializing():
            m0.value, v0.value = nm0, nv0
            m1.value, v1.value = nm1, nv1
        return y

    @nn.compact
    def __call__(self, x):
        from ..core.pallas.cm import CM, as_ndhwc, concat_cm
        from ..core.pallas.conv3d import supported as pallas_conv_ok
        from ..core.pallas.fused_stack import (
            fused_cbr2, fused_cbr2_first_xla, fused_stack_supported,
            fused_stack_first_xla_supported)
        if isinstance(x, (tuple, list)):  # virtual concat (tuple of CMs)
            b, d, h, w, _ = x[0].logical_shape
            shape = (b, d, h, w, sum(p.data.shape[2] for p in x))
        else:
            shape = x.logical_shape if isinstance(x, CM) else x.shape
        if self.use_fused_stack:
            args = (shape, self.features, self.kernel_sizes,
                    self.paddings, self.strides, self.norm_method,
                    self.act_method, self.dropout)
            if fused_stack_supported(*args):
                return self._fused(x, fused_cbr2, cm_capable=True)
            if not isinstance(x, (tuple, list)) \
                    and fused_stack_first_xla_supported(*args):
                return self._fused(as_ndhwc(x), fused_cbr2_first_xla,
                                   cm_capable=True)
        if isinstance(x, (tuple, list)):
            x = concat_cm(list(x))
        x = as_ndhwc(x)
        norm_factory = make_norm(self.norm_method, self.dtype, self.axis_name)
        act = make_act(self.act_method)
        for i, feat in enumerate(self.features):
            k = self.kernel_sizes[i]
            p = self.paddings[i]
            s = self.strides[i]
            if self.use_pallas_conv and pallas_conv_ok(
                    x.shape, (k, k, k), (s, s, s),
                    ((p, p), (p, p), (p, p))):
                x = PallasConv3d(features=feat, use_bias=self.use_bias,
                                 dtype=self.dtype, name=f"conv_{i}")(x)
            else:
                x = nn.Conv(features=feat,
                            kernel_size=(k, k, k),
                            strides=(s, s, s),
                            padding=[(p, p)] * 3,
                            use_bias=self.use_bias,
                            kernel_init=kaiming_normal_conv,
                            bias_init=constant(0.01),
                            dtype=self.dtype,
                            name=f"conv_{i}")(x)
            norm = norm_factory(use_running_average=not self.train)
            if norm is not None:
                x = norm(x)
            x = act(x)
            if self.dropout > 0:
                x = nn.Dropout(rate=self.dropout,
                               deterministic=not self.train)(x)
        return x


class ConvBlock5d(nn.Module):
    """Plain conv stack (bottleneck block)."""

    features: Sequence[int]
    kernel_size: Any = 3
    padding: Any = 1
    strides: Any = 1
    use_bias: bool = False
    norm_method: str | None = "bn"
    act_method: str = "relu"
    dropout: float = 0.0
    train: bool = True
    dtype: Dtype = jnp.float32
    axis_name: str | None = None
    use_pallas_conv: bool = False
    use_fused_stack: bool = False
    fused_interpret: bool = False
    fused_cm: bool = False

    @nn.compact
    def __call__(self, x):
        n = len(self.features)
        return ConvStack(self.features,
                         _as_list(self.kernel_size, n),
                         _as_list(self.padding, n),
                         _as_list(self.strides, n),
                         self.use_bias, self.norm_method, self.act_method,
                         self.dropout, self.train, self.dtype,
                         self.axis_name, self.use_pallas_conv,
                         self.use_fused_stack, self.fused_interpret,
                         self.fused_cm, name="convs")(x)


class ConvPoolBlock5d(nn.Module):
    """Conv stack returning (pre-pool features, 2x-maxpooled features)."""

    features: Sequence[int]
    kernel_size: Any = 3
    padding: Any = 1
    use_bias: bool = False
    pool_size: int = 2
    pool_strides: int = 2
    norm_method: str | None = "bn"
    act_method: str = "relu"
    dropout: float = 0.0
    train: bool = True
    dtype: Dtype = jnp.float32
    axis_name: str | None = None
    use_pallas_conv: bool = False
    use_fused_stack: bool = False
    fused_interpret: bool = False
    fused_cm: bool = False

    @nn.compact
    def __call__(self, x):
        from ..core.pallas.cm import CM, maxpool2_cm
        n = len(self.features)
        y = ConvStack(self.features,
                      _as_list(self.kernel_size, n),
                      _as_list(self.padding, n),
                      [1] * n,
                      self.use_bias, self.norm_method, self.act_method,
                      self.dropout, self.train, self.dtype,
                      self.axis_name, self.use_pallas_conv,
                      self.use_fused_stack, self.fused_interpret,
                      self.fused_cm, name="convs")(x)
        if isinstance(y, CM):
            D = y.data.shape[1]
            if (self.pool_size == 2 and self.pool_strides == 2
                    and D % 2 == 0 and y.H % 2 == 0 and y.W % 2 == 0):
                # flat-layout Pallas pool on TPU (pool.py), XLA
                # reshape+reduce-max elsewhere — maxpool2_cm routes
                return y, maxpool2_cm(y)
            from ..core.pallas.cm import as_ndhwc
            y = as_ndhwc(y)
        pooled = nn.max_pool(y, window_shape=(self.pool_size,) * 3,
                             strides=(self.pool_strides,) * 3)
        return y, pooled


class UpsampleConvBlock5d(nn.Module):
    """Trilinear x2 upsample -> crop-concat skip -> conv stack.

    local_upsample=True swaps the reference's align-corners upsample for a
    strictly local half-pixel 2x kernel (core.resample.upsample2x_local),
    enabling exact overlap-tile spatial sharding of whole-scan inference.
    """

    features: Sequence[int]
    scale_factor: int = 2
    kernel_size: Any = 3
    padding: Any = 1
    use_bias: bool = False
    norm_method: str | None = "bn"
    act_method: str = "relu"
    dropout: float = 0.0
    train: bool = True
    dtype: Dtype = jnp.float32
    axis_name: str | None = None
    local_upsample: bool = False
    use_pallas_conv: bool = False
    use_fused_stack: bool = False
    fused_interpret: bool = False
    fused_cm: bool = False

    @nn.compact
    def __call__(self, x, skip):
        from ..core.pallas.cm import CM, as_ndhwc, upsample2x_cm
        from ..core.resample import resize3d, upsample2x_local
        sf = self.scale_factor
        if isinstance(sf, (tuple, list)):
            sf = sf[0]
        if (isinstance(x, CM) and isinstance(skip, CM) and sf == 2
                and not self.local_upsample
                and (2 * x.data.shape[1], 2 * x.H, 2 * x.W)
                == (skip.data.shape[1], skip.H, skip.W)):
            # cm-resident decoder step: matrix upsample + VIRTUAL channel
            # concat (ConvStack streams the parts straight into the fused
            # kernel; falls back to a real concat_cm on the unfused
            # path), no crop needed (exact 2x ladder), no layout round
            # trip. Reference order crop_concat_5d(up, skip)
            # (parts.py:37-46,116-155).
            x = (upsample2x_cm(x), skip)
        else:
            x, skip = as_ndhwc(x), as_ndhwc(skip)
            if self.local_upsample and sf == 2:
                x = upsample2x_local(x)
            else:
                out_size = tuple(int(s * sf) for s in x.shape[1:4])
                x = resize3d(x, out_size, method="trilinear",
                             align_corners=True)
            x = crop_concat(x, skip)
        n = len(self.features)
        return ConvStack(self.features,
                         _as_list(self.kernel_size, n),
                         _as_list(self.padding, n),
                         [1] * n,
                         self.use_bias, self.norm_method, self.act_method,
                         self.dropout, self.train, self.dtype,
                         self.axis_name, self.use_pallas_conv,
                         self.use_fused_stack, self.fused_interpret,
                         self.fused_cm, name="convs")(x)
