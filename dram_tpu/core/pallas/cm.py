"""Kernel-layout ("cm") activation residency between fused conv stacks.

The fused Pallas conv chain (fused_stack.py) computes in a plane-minor
(B, D, C, M = lane-padded H*W) layout. Round 2's train-step profile showed
~65 ms/step of pure layout copies: every stack boundary paid an
NDHWC -> cm transpose on entry and a cm -> NDHWC transpose on exit, only
for the next block to transpose straight back (plus the same pairs around
every cotangent in the backward pass). This module makes the cm layout the
*resident* activation format between stacks: the boundary ops of the DC3D
U-Net (2x max-pool, align-corners trilinear 2x upsample / resize, skip
concatenation, 1x1x1 convolutions) run directly on the (B, D, C, M)
layout, so a training step transposes only at the network entry and at the
tiny top-layer exit.

`CM` is a registered pytree carrying the true plane dims (H, W) statically
(the lane pad makes them unrecoverable from the array shape alone), so it
flows through flax modules, jax.checkpoint (remat) and custom VJPs.

All ops here are plain XLA (differentiable by tracing); pad lanes of every
array THIS module produces are zero. The conv kernels' outputs may carry
garbage in pad lanes (the dx=0/dy=0 paths skip the pad mask for VPU
throughput) — the cm ecosystem defends on READ instead: the conv kernels
mask pad lanes at patch build (conv3d.py:_plane_valid), the pool reads
only interior window lanes, stats/backward passes apply lane masks, and
every exit to NDHWC slices the pad off.

Reference parity note: these are layout-only rewrites of reference
parts.py:116-155 (Upsample + crop-concat) and the nn.MaxPool3d of
parts.py:157-196; numerics are covered by the fused-vs-unfused module
tests (tests/test_fused_stack.py) and the cm-op unit tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..resample import _axis_weights
from .conv3d import _plane_pad


@functools.lru_cache(maxsize=None)
def _up2_tables(n):
    """Align-corners 2x interpolation taps along one axis: out[i] =
    x[lo_i]*(1-f_i) + x[hi_i]*f_i with t_i = i*(n-1)/(2n-1) (torch
    semantics, identical to _axis_weights('linear_ac'))."""
    i = np.arange(2 * n)
    t = i * (n - 1) / (2 * n - 1) if n > 1 else np.zeros(2 * n)
    lo = np.floor(t).astype(np.int32)
    hi = np.minimum(lo + 1, n - 1)
    f = (t - lo).astype(np.float32)
    return lo, hi, f


@functools.lru_cache(maxsize=None)
def _up2_adjoint_tables(n):
    """Fixed-K gather tables for the transpose of _up2_tables: input row
    d accumulates dy[g[k, d]] * w[k, d] (w zero-padded)."""
    lo, hi, f = _up2_tables(n)
    taps = [[] for _ in range(n)]
    for o in range(2 * n):
        taps[lo[o]].append((o, 1.0 - float(f[o])))
        if hi[o] != lo[o]:
            taps[hi[o]].append((o, float(f[o])))
    K = max(len(v) for v in taps)
    g = np.zeros((K, n), np.int32)
    w = np.zeros((K, n), np.float32)
    for d, v in enumerate(taps):
        for k in range(K):
            # unused taps repeat the row's first index at weight 0 so
            # the kernel's per-block DMA window stays tight (a 0 index
            # would span the whole axis)
            o, wt = v[k] if k < len(v) else (v[0][0], 0.0)
            g[k, d] = o
            w[k, d] = wt
    return g, w


def _up2_depth_einsum(x, D):
    """Matrix formulation of the align-corners 2x depth pass (XLA dot;
    pays layout copies around the dot — the Pallas row-lerp kernel in
    upsample.py is the fast path; jnp.take along axis 1 lowers as a
    TPU gather and measured ~50 ms/step SLOWER than even this)."""
    f32 = jnp.float32
    Wd, _ = _axis_weights(D, 2 * D, "linear_ac", None)
    y = jnp.einsum("od,bdcm->bocm", jnp.asarray(Wd, f32),
                   x, preferred_element_type=f32)
    return y.astype(x.dtype)


@jax.tree_util.register_pytree_node_class
class CM:
    """Lane-padded kernel-layout activation: data (B, D, C, M) plus the
    plane's true (H, W) as static metadata (M = _plane_pad(H * W))."""

    __slots__ = ("data", "H", "W")

    def __init__(self, data, H, W):
        self.data = data
        self.H = int(H)
        self.W = int(W)

    def tree_flatten(self):
        return (self.data,), (self.H, self.W)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], aux[1])

    @property
    def logical_shape(self):
        """The NDHWC shape this activation represents."""
        B, D, C, _ = self.data.shape
        return (B, D, self.H, self.W, C)

    @property
    def dtype(self):
        return self.data.dtype

    def __repr__(self):
        return f"CM(data={self.data.shape}, H={self.H}, W={self.W})"


def to_cm(x):
    """NDHWC -> (B, D, C, M) lane-padded kernel layout (no z pad)."""
    B, D, H, W, C = x.shape
    M = _plane_pad(H * W)
    x = jnp.transpose(x.reshape(B, D, H * W, C), (0, 1, 3, 2))
    if M > H * W:
        x = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, M - H * W)])
    return x


def from_cm(x, H, W):
    """(B, D, C, M) -> NDHWC (dropping lane pad)."""
    B, D, C, M = x.shape
    return jnp.transpose(x[..., :H * W], (0, 1, 3, 2)).reshape(B, D, H, W, C)


def to_cm_t(x):
    """NDHWC array -> CM."""
    return CM(to_cm(x), x.shape[2], x.shape[3])


def as_ndhwc(x):
    """CM -> NDHWC array; NDHWC arrays pass through."""
    if isinstance(x, CM):
        return from_cm(x.data, x.H, x.W)
    return x


def _repack(x5, dtype):
    """(B, D, C, H, W) -> zero-lane-padded (B, D, C, M) CM data."""
    B, D, C, H, W = x5.shape
    M = _plane_pad(H * W)
    x = x5.reshape(B, D, C, H * W)
    if M > H * W:
        x = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, M - H * W)])
    return x.astype(dtype)


def _unpack(cm):
    """CM -> (B, D, C, H, W) view (pad lanes dropped)."""
    B, D, C, _ = cm.data.shape
    return cm.data[..., :cm.H * cm.W].reshape(B, D, C, cm.H, cm.W)


def poison_pad_lanes(cm, value=1e30):
    """Test/debug helper enforcing the defend-on-read contract.

    Conv kernel outputs may carry garbage in pad lanes (module docstring);
    every consumer must mask or slice before reducing over the full M
    axis. Tests overwrite the pad lanes with a loud sentinel after conv
    calls and assert downstream results are unchanged — an unmasked
    full-M reduction then fails with a ~1e30-magnitude result instead of
    silently passing on the zeros the reference inputs happen to carry.
    Returns a CM with identical valid lanes and `value` in pad lanes."""
    data = cm.data
    M = data.shape[-1]
    hw = cm.H * cm.W
    if M == hw:
        return cm
    lane = jnp.arange(M) >= hw
    data = jnp.where(lane, jnp.asarray(value, data.dtype), data)
    return CM(data, cm.H, cm.W)


def maxpool2_cm(cm, use_pallas=None):
    """2x2x2 max-pool, stride 2 (reference nn.MaxPool3d(2, 2)) on the cm
    layout. Requires even D, H, W (the caller falls back to the NDHWC
    path otherwise).

    Default path: the flat-layout Pallas kernel (pool.py) — one pass
    over x forward, one x + one dx pass backward, window compaction via
    MXU block-selection dots; no 5-D view of the activation ever exists
    (an XLA formulation pays either T(2,128) window-broadcast padding,
    ~19 ms/step, or lane-strided slices lowered as while-loops with
    full-resolution DUS scatters, ~27 ms/step, at DC3D bs10).
    Falls back to the XLA reshape formulation when the kernel is off."""
    B, D, C, M = cm.data.shape
    H, W = cm.H, cm.W
    assert D % 2 == 0 and H % 2 == 0 and W % 2 == 0, (D, H, W)
    from .pool import flat_pool_supported, maxpool2_flat
    if use_pallas is None:
        use_pallas = flat_pool_supported(D, H, W)
    if use_pallas:
        return CM(maxpool2_flat(cm.data, H, W), H // 2, W // 2)
    x = _unpack(cm)
    x = x.reshape(B, D // 2, 2, C, H // 2, 2, W // 2, 2)
    x = x.max(axis=(2, 5, 7))
    return CM(_repack(x, cm.dtype), H // 2, W // 2)


def resize_cm(cm, out_dhw, align_corners=True):
    """Separable trilinear resize on the cm layout (torch semantics,
    matching core.resample.resize3d)."""
    x = _unpack(cm).astype(jnp.float32)
    mode = "linear_ac" if align_corners else "linear_hp"
    oD, oH, oW = (int(v) for v in out_dhw)
    if x.shape[1] != oD:
        Wm, _ = _axis_weights(x.shape[1], oD, mode, None)
        x = jnp.einsum("oi,bichw->bochw", jnp.asarray(Wm), x)
    if x.shape[3] != oH:
        Wm, _ = _axis_weights(x.shape[3], oH, mode, None)
        x = jnp.einsum("oh,bdchw->bdcow", jnp.asarray(Wm), x)
    if x.shape[4] != oW:
        Wm, _ = _axis_weights(x.shape[4], oW, mode, None)
        x = jnp.einsum("ow,bdchw->bdcho", jnp.asarray(Wm), x)
    return CM(_repack(x, cm.dtype), oH, oW)


def upsample2x_cm(cm):
    """Align-corners trilinear 2x upsample (reference nn.Upsample
    scale_factor=2, align_corners=True) on the cm layout.

    Pass order is in-plane FIRST (H then W, at the low depth — half the
    volume of the depth-first order), depth LAST directly on the flat
    (B, D, C, M) form — so the expensive full-volume pass needs no
    (B, D, C, H, W) view and the output lands in the kernel layout
    without a relayout copy (the depth-first order cost ~11 ms/step of
    resize passes + flat<->5-D copies at the us_2 level). Separable
    passes commute exactly.

    Activations stay in the input dtype BETWEEN passes (f32 weights, f32
    MXU accumulation per pass): a bf16 model halves every pass's HBM
    bytes vs the old all-f32 chain (~6 ms/step at the us_2 level, where
    the f32 depth dot + relayout were 10 ms of the train-step trace); an
    f32 input computes exactly as before. The two extra bf16 roundings
    between passes are ~0.4% relative — the same order as the bf16
    activations themselves."""
    B, D, C, M = cm.data.shape
    H, W = cm.H, cm.W
    dt = cm.dtype
    f32 = jnp.float32
    x = cm.data[..., :H * W].reshape(B, D, C, H, W)
    Wh, _ = _axis_weights(H, 2 * H, "linear_ac", None)
    Ww, _ = _axis_weights(W, 2 * W, "linear_ac", None)
    x = jnp.einsum("oh,bdchw->bdcow", jnp.asarray(Wh, f32), x,
                   preferred_element_type=f32).astype(dt)
    x = jnp.einsum("ow,bdchw->bdcho", jnp.asarray(Ww, f32), x,
                   preferred_element_type=f32).astype(dt)
    flat = _repack(x, dt)  # (B, D, C, M2) lane-padded plane
    # depth pass: Pallas row-lerp when supported (no dot, no relayout —
    # the einsum form paid ~8-10 ms/step of layout copies at the us
    # levels), einsum fallback otherwise
    from .upsample import up2_depth_flat, up2_depth_supported
    if up2_depth_supported(flat.shape, flat.dtype.itemsize):
        return CM(up2_depth_flat(flat), 2 * H, 2 * W)
    return CM(_up2_depth_einsum(flat, D), 2 * H, 2 * W)


def concat_cm(cms):
    """Channel concatenation of same-plane CM activations."""
    H, W = cms[0].H, cms[0].W
    for c in cms[1:]:
        assert (c.H, c.W) == (H, W), "concat_cm requires equal planes"
    return CM(jnp.concatenate([c.data for c in cms], axis=2), H, W)


def conv1x1_cm(cm, kernel, bias, dtype):
    """1x1x1 convolution on the cm layout (nn.Conv numerics: input and
    kernel promoted to `dtype`, f32 params). kernel: (1, 1, 1, Ci, Co)."""
    ci, co = kernel.shape[3], kernel.shape[4]
    k = kernel.reshape(ci, co).astype(dtype)
    y = jnp.einsum("bdim,io->bdom", cm.data.astype(dtype), k)
    if bias is not None:
        y = y + bias.astype(y.dtype)[None, None, :, None]
    return CM(y, cm.H, cm.W)
