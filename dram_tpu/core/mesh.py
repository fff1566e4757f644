"""Device mesh, sharding helpers and the halo-exchange primitive.

The reference is single-process single-GPU (SURVEY.md §2.7 — no process
groups, no collectives anywhere); this module is the TPU-native parallelism
layer that replaces nothing and enables everything:

* `best_mesh` — a ('data',) mesh over the available chips; the trainer
  shards the chunk batch across it and XLA inserts the gradient psum and
  global BatchNorm-stat reductions (ICI traffic, no hand-written NCCL).
* `spatial_mesh` / `halo_exchange` — context-parallel building block for
  whole-scan inference: shard the D axis of a volume across chips and
  exchange stencil halos with ppermute so 3x3x3 convs and k^3 stencil
  attention stay exact at shard boundaries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed():
    """Initialize jax.distributed for multi-host runs when the environment
    announces one (TPU pod env vars or an explicit coordinator); no-op and
    safe on single-host. Call before the first device query."""
    import os
    # env sniff BEFORE any jax call: a device query would initialize the
    # backend and make distributed.initialize() impossible
    want = any(os.environ.get(k) for k in
               ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES"))
    if not want:
        return False
    try:
        jax.distributed.initialize()
        return True
    except Exception:
        return False


def best_mesh(axis_name="data", devices=None, dcn_axis=None, dcn_size=None):
    """A mesh over ALL the devices, or None when single-device.

    Default: a 1-D ('data',) mesh — collectives ride ICI within the slice.
    With `dcn_axis`, a 2-D (dcn, ici) mesh for multi-host runs: devices are
    grouped by owning process so the leading axis crosses hosts (DCN) and
    the trailing axis stays intra-host (ICI); XLA then lowers the leading-
    axis collectives onto DCN and keeps the heavy traffic on ICI. On a
    single process (tests), `dcn_size` reshapes the flat device list so
    the 2-D sharding specs compile and run on a fake mesh.

    Batches that don't divide the device count are padded with zero-weight
    rows (`pad_batch`) rather than shrinking the mesh — no chip ever idles
    because of an awkward batch size.
    """
    devices = devices if devices is not None else jax.devices()
    if len(devices) <= 1:
        return None
    if dcn_axis is None:
        return Mesh(np.asarray(devices), (axis_name,))
    import collections
    groups = collections.defaultdict(list)
    for d in devices:
        groups[getattr(d, "process_index", 0)].append(d)
    if dcn_size is None:
        dcn_size = len(groups)
    if len(groups) == dcn_size and dcn_size > 1 and \
            len({len(g) for g in groups.values()}) == 1:
        arr = np.asarray([groups[k] for k in sorted(groups)])
    else:
        if len(devices) % dcn_size:
            raise ValueError(f"{len(devices)} devices don't split into "
                             f"{dcn_size} DCN groups")
        arr = np.asarray(devices).reshape(dcn_size, -1)
    return Mesh(arr, (dcn_axis, axis_name))


def pad_batch(arrays, n_shards):
    """Pad each array's leading axis up to a multiple of `n_shards`.

    Padding rows repeat real samples (wrap-around) so every shard computes
    on well-formed data; the returned `weights` vector is 1 for real rows
    and 0 for padding. Losses accept it as `sample_weight` and exclude
    padded rows from every reduction, so the gradients equal the unpadded
    single-device computation exactly.

    Returns (padded_arrays, weights).
    """
    b = int(np.shape(arrays[0])[0])
    pad = (-b) % max(int(n_shards), 1)
    weights = np.ones(b + pad, np.float32)
    if pad == 0:
        return tuple(arrays), weights
    weights[b:] = 0.0
    idx = np.arange(b + pad) % b
    return tuple(np.asarray(a)[idx] for a in arrays), weights


def batch_spec(mesh):
    """PartitionSpec sharding the leading (batch) axis over EVERY mesh
    axis — on a (dcn, ici) mesh the batch splits across hosts first, then
    chips."""
    return P(tuple(mesh.axis_names))


def process_local_rows(sharding, global_shape):
    """Leading-axis row range [lo, hi) of `global_shape` that THIS process's
    addressable devices own under `sharding`. With a process-major device
    order (jax.devices(), and best_mesh's DCN grouping) the range is
    contiguous; asserts if it is not."""
    idx_map = sharding.addressable_devices_indices_map(tuple(global_shape))
    spans = []
    for idx in idx_map.values():
        sl = idx[0]
        spans.append((sl.start or 0,
                      global_shape[0] if sl.stop is None else sl.stop))
    lo = min(s for s, _ in spans)
    hi = max(e for _, e in spans)
    n_rows = sum(e - s for s, e in set(spans))
    assert n_rows == hi - lo, \
        "process-local batch rows are not contiguous; use a process-major mesh"
    return lo, hi


def local_batch_rows(mesh, global_batch):
    """Per-process sampler sharding plan: ((lo, hi), padded_batch).

    `padded_batch` is `global_batch` rounded up to the device count;
    [lo, hi) is the leading-axis row range of the padded global batch
    that THIS process's devices own. A loader that yields only rows
    [lo, min(hi, global_batch)) of each global index batch feeds
    `shard_batch_arrays(..., local_rows=((lo, hi), padded_batch))` with
    zero redundant I/O — host reads scale as global_batch/process_count
    instead of every process loading the whole global batch."""
    n = int(mesh.devices.size)
    padded = -(-int(global_batch) // n) * n
    sh = NamedSharding(mesh, batch_spec(mesh))
    return process_local_rows(sh, (padded,)), padded


def shard_batch_arrays(mesh, arrays, axis_name=None, local_rows=None):
    """Shard each array's leading (batch) axis over all mesh axes (or an
    explicit axis subset).

    Single-process: a plain device_put. Multi-process (jax.distributed),
    default: every process passes the same GLOBAL batch (the identically-
    seeded sampler makes the loaders agree), and each process hands only
    its own row slice to `jax.make_array_from_process_local_data` — no
    process ever device_puts onto a non-addressable device. With
    `local_rows=((lo, hi), padded_batch)` (see local_batch_rows) each
    array holds ONLY this process's rows [lo, hi) and is handed over
    as-is — the per-process-loading fast path.
    """
    names = tuple(mesh.axis_names) if axis_name is None else axis_name
    multi = jax.process_count() > 1
    out = []
    for a in arrays:
        spec = P(names) if np.ndim(a) >= 1 else P()
        sh = NamedSharding(mesh, spec)
        if local_rows is not None and np.ndim(a) >= 1:
            (lo, hi), padded = local_rows
            a = np.ascontiguousarray(np.asarray(a))
            assert a.shape[0] == hi - lo, \
                f"local batch has {a.shape[0]} rows, sharding owns {hi - lo}"
            gshape = (padded,) + a.shape[1:]
            if multi:
                out.append(jax.make_array_from_process_local_data(
                    sh, a, gshape))
            else:
                out.append(jax.device_put(jnp.asarray(a), sh))
        elif multi:
            a = np.asarray(a)
            if a.ndim >= 1:
                lo, hi = process_local_rows(sh, a.shape)
                out.append(jax.make_array_from_process_local_data(
                    sh, np.ascontiguousarray(a[lo:hi]), a.shape))
            else:
                out.append(jax.make_array_from_process_local_data(
                    sh, a, a.shape))
        else:
            out.append(jax.device_put(jnp.asarray(a), sh))
    return tuple(out)


def replicate(mesh, tree):
    """Put a pytree fully replicated on the mesh (multi-process safe)."""
    s = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        def put(a):
            a = np.asarray(a)
            return jax.make_array_from_callback(a.shape, s,
                                                lambda idx: a[idx])
        return jax.tree.map(put, tree)
    return jax.tree.map(lambda a: jax.device_put(a, s), tree)


def spatial_mesh(axis_name="space", devices=None):
    """1-D mesh for spatial (context-parallel) sharding of volumes."""
    return best_mesh(axis_name=axis_name, devices=devices)


def halo_exchange(x, axis_name, halo, axis):
    """Exchange `halo`-wide slabs with mesh neighbours along `axis`.

    Must be called inside shard_map over `axis_name`; x is the local shard.
    Returns the shard extended by `halo` on both sides — boundary shards
    get zero padding (matching 'same' conv zero-padding at volume edges).
    """
    n = jax.lax.axis_size(axis_name)
    size = x.shape[axis]
    right_edge = jax.lax.slice_in_dim(x, size - halo, size, axis=axis)
    left_edge = jax.lax.slice_in_dim(x, 0, halo, axis=axis)
    if n > 1:
        # shard i's right edge becomes shard i+1's left halo
        left_halo = jax.lax.ppermute(right_edge, axis_name,
                                     [(i, i + 1) for i in range(n - 1)])
        right_halo = jax.lax.ppermute(left_edge, axis_name,
                                      [(i + 1, i) for i in range(n - 1)])
    else:
        left_halo = jnp.zeros_like(right_edge)
        right_halo = jnp.zeros_like(left_edge)
    return jnp.concatenate([left_halo, x, right_halo], axis=axis)


def overlap_tile_infer(apply_fn, x, lobe, n_tiles, halo, mesh=None,
                       axis_name="data"):
    """Context-parallel whole-scan inference by overlap-tile decomposition.

    The D axis is cut into `n_tiles` windows of D/n_tiles + 2*halo voxels,
    CLAMPED inside the volume (boundary windows shift inward instead of
    zero-padding, so true volume edges get exactly the unsharded per-layer
    conv padding — a zero halo slab would leak conv-bias "ghost" values
    through deeper layers). Windows are stacked on the batch axis, run as
    one batch through `apply_fn(x, lobe) -> (dense, refined)`, and the
    halo-contaminated borders are cropped off.

    Exact for stencil-local networks when `halo` >= the receptive-field
    radius: eval-mode BatchNorm (pointwise) and DC3D(local_upsample=True)
    qualify; align-corners upsampling and GroupNorm (global statistics) are
    approximate. Per-tile activation memory drops n_tiles-fold (the real
    constraint for whole-scan inference), and with a mesh the tile batch is
    sharded across chips (SURVEY.md §2.7 spatial/context parallelism).

    D must divide by n_tiles; D/n_tiles and halo should be multiples of the
    network's total pooling factor.
    """
    B, D = x.shape[0], x.shape[1]
    assert D % n_tiles == 0, "D must divide by n_tiles"
    d_local = D // n_tiles
    win = min(D, d_local + 2 * halo)

    starts, offs = [], []
    for i in range(n_tiles):
        s = min(max(i * d_local - halo, 0), D - win)
        starts.append(s)
        offs.append(i * d_local - s)  # tile position inside its window

    wx = jnp.concatenate([jax.lax.slice_in_dim(x, s, s + win, axis=1)
                          for s in starts], axis=0)
    wl = jnp.concatenate([jax.lax.slice_in_dim(lobe, s, s + win, axis=1)
                          for s in starts], axis=0)
    if mesh is not None:
        sharding = NamedSharding(mesh, P(axis_name))
        wx = jax.device_put(wx, sharding)
        wl = jax.device_put(wl, sharding)
    dense, refined = apply_fn(wx, wl)

    def stitch(t):
        parts = []
        for i in range(n_tiles):
            tile = jax.lax.slice_in_dim(t, i * B, (i + 1) * B, axis=0)
            parts.append(jax.lax.slice_in_dim(tile, offs[i],
                                              offs[i] + d_local, axis=1))
        return jnp.concatenate(parts, axis=1)

    return stitch(dense), stitch(refined)


def sharded_stencil_apply(fn, volume, mesh, halo, axis=0,
                          axis_name="space"):
    """Apply a local stencil function to a volume sharded along `axis`.

    `fn(block)` must be shift-invariant with receptive-field radius <= halo
    and preserve the block's shape. The volume's `axis` must divide evenly
    over the mesh. Returns the full-shape result, computed shard-wise with
    halo exchange (context-parallel analog for conv/stencil-attention
    inference on scans too big for one chip's HBM).
    """
    from jax import shard_map

    ndim = volume.ndim
    spec_elems = [None] * ndim
    spec_elems[axis] = axis_name
    spec = P(*spec_elems)

    def local(block):
        ext = halo_exchange(block, axis_name, halo, axis)
        out = fn(ext)
        return jax.lax.slice_in_dim(out, halo, halo + block.shape[axis],
                                    axis=axis)

    f = shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=spec)
    return f(volume)
