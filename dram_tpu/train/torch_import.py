"""Import reference PyTorch ``.pth`` checkpoints into the flax state tree.

The reference ecosystem's artifacts are torch state dicts saved by
``job_runner.py:707-716`` (``{"epoch", "iteration", "model", "optimizer",
"metrics"}``) and re-loaded with the tolerant merge of
``job_runner.py:252-288``.  This module maps those state-dict keys — the
module tree of the reference ``DC3D`` / ``DC3DATGeneric``
(reference models.py:52-147, :415-597; parts.py:66-196) — onto this
package's flax param/batch_stats tree, so real reference weights can be
evaluated (and Dice-parity demonstrated) through the TPU pipeline without
ever running the torch code.

Key correspondence (torch -> flax):

  ds_modules.{i}.conv_blocks.{j}.0.{weight,bias}  -> ds_{i}/convs/conv_{j}
  ds_modules.{i}.conv_blocks.{j}.1.weight         -> ds_{i}/convs/BatchNorm_{j}/scale
  ds_modules.{i}.conv_blocks.{j}.1.bias           -> .../BatchNorm_{j}/bias
  ds_modules.{i}.conv_blocks.{j}.1.running_mean   -> batch_stats .../mean
  ds_modules.{i}.conv_blocks.{j}.1.running_var    -> batch_stats .../var
  bg.conv_blocks...                               -> bg/convs/...
  us_modules.{i}.conv_blocks...                   -> us_{i}/convs/...
  top_layer.{weight,bias}                         -> top_layer/{kernel,bias}
  reshape.{i}.0.{weight,bias}                     -> reshape_{i}/conv/...
  reshape.{i}.1.*                                 -> reshape_{i}/bn/...
  attention_module.{theta,phi,G,r,geo_*}.{weight,bias}
                                                  -> attention_module/...

Layout conversions: Conv3d weight (Co,Ci,kd,kh,kw) -> flax kernel
(kd,kh,kw,Ci,Co); Linear weight (out,in) -> Dense kernel (in,out).
``num_batches_tracked`` buffers and the reference's ``dummy``
requires-grad scalar (models.py:111) have no flax counterpart and are
dropped.  For ``DC3DATGeneric`` checkpoints the backbone keys land under
``backbone/`` to match this package's module nesting (dc3d_at.py).
"""

from __future__ import annotations

import numpy as np

# PCM projection heads: same attribute names on both sides
# (reference models.py:169-191 <-> dram_tpu/models/pcm.py).
_PCM_LINEARS = ("theta", "phi", "G", "r", "geo_theta", "geo_phi")
# Keys that mark a DC3DATGeneric checkpoint (reference models.py:488-495).
_AT_PREFIXES = ("reshape.", "attention_module.")


def _conv_kernel(w):
    """torch Conv3d (Co,Ci,kd,kh,kw) -> flax (kd,kh,kw,Ci,Co)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _np(v):
    if hasattr(v, "detach"):  # torch tensor
        v = v.detach().cpu().numpy()
    return np.asarray(v, np.float32)


def convert_state_dict(sd, log=None):
    """Reference model state dict -> (params, batch_stats) nested dicts.

    Returns plain dict-of-ndarray trees in this package's naming; keys the
    mapper does not recognize are skipped with a log line, mirroring the
    reference loader's tolerance (job_runner.py:252-288).
    """
    log = log or (lambda *_: None)
    is_at = any(k.startswith(_AT_PREFIXES) for k in sd)
    params, stats = {}, {}
    skipped = []

    def backbone(path):
        return (("backbone",) + path) if is_at else path

    for key, raw in sd.items():
        parts = key.split(".")
        head = parts[0]
        if head == "dummy" or parts[-1] == "num_batches_tracked":
            continue
        v = _np(raw)
        if head in ("ds_modules", "us_modules") and len(parts) == 6 and \
                parts[2] == "conv_blocks":
            flax_mod = ("ds_" if head == "ds_modules" else "us_") + parts[1]
            base = backbone((flax_mod,))
            _stack_put(params, stats, base, parts[3], parts[4], parts[5],
                       v, key, skipped)
        elif head == "bg" and len(parts) == 5 and parts[1] == "conv_blocks":
            _stack_put(params, stats, backbone(("bg",)), parts[2], parts[3],
                       parts[4], v, key, skipped)
        elif head == "top_layer" and len(parts) == 2:
            if parts[1] == "weight":
                _set(params, backbone(("top_layer", "kernel")),
                     _conv_kernel(v))
            elif parts[1] == "bias":
                _set(params, backbone(("top_layer", "bias")), v)
            else:
                skipped.append(key)
        elif head == "reshape" and len(parts) == 4:
            i, lidx, leaf = parts[1], parts[2], parts[3]
            if lidx == "0":  # 1x1x1 Conv3d tap head
                if leaf == "weight":
                    _set(params, (f"reshape_{i}", "conv", "kernel"),
                         _conv_kernel(v))
                elif leaf == "bias":
                    _set(params, (f"reshape_{i}", "conv", "bias"), v)
                else:
                    skipped.append(key)
            elif lidx == "1":  # BatchNorm3d
                if leaf == "weight":
                    _set(params, (f"reshape_{i}", "bn", "scale"), v)
                elif leaf == "bias":
                    _set(params, (f"reshape_{i}", "bn", "bias"), v)
                elif leaf == "running_mean":
                    _set(stats, (f"reshape_{i}", "bn", "mean"), v)
                elif leaf == "running_var":
                    _set(stats, (f"reshape_{i}", "bn", "var"), v)
                else:
                    skipped.append(key)
            else:
                skipped.append(key)
        elif head == "attention_module" and len(parts) == 3 and \
                parts[1] in _PCM_LINEARS:
            if parts[2] == "weight":  # Linear (out,in) -> Dense (in,out)
                _set(params, ("attention_module", parts[1], "kernel"),
                     np.ascontiguousarray(v.T))
            elif parts[2] == "bias":
                _set(params, ("attention_module", parts[1], "bias"), v)
            else:
                skipped.append(key)
        else:
            skipped.append(key)

    for k in skipped:
        log(f"torch-import: no flax counterpart for '{k}', skipped")
    return params, stats


def _stack_put(params, stats, base, j, lidx, leaf, v, key, skipped):
    """Place one conv_blocks.{j}.{0|1}.{leaf} tensor."""
    if lidx == "0":  # Conv3d
        if leaf == "weight":
            _set(params, base + ("convs", f"conv_{j}", "kernel"),
                 _conv_kernel(v))
        elif leaf == "bias":
            _set(params, base + ("convs", f"conv_{j}", "bias"), v)
        else:
            skipped.append(key)
    elif lidx == "1":  # BatchNorm3d
        bn = base + ("convs", f"BatchNorm_{j}")
        if leaf == "weight":
            _set(params, bn + ("scale",), v)
        elif leaf == "bias":
            _set(params, bn + ("bias",), v)
        elif leaf == "running_mean":
            _set(stats, bn + ("mean",), v)
        elif leaf == "running_var":
            _set(stats, bn + ("var",), v)
        else:
            skipped.append(key)
    else:
        skipped.append(key)


def load_torch_checkpoint(path, log=None):
    """Read a reference ``.pth`` -> {"model": {"params", "batch_stats"},
    "epoch", "iteration"} in this package's checkpoint layout.

    Accepts either the full training save dict (``{"model": sd, ...}``,
    job_runner.py:707-716) or a bare model state dict.
    """
    import torch

    try:
        saved = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        saved = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(saved, dict) and "model" in saved and \
            not any("." in k for k in saved):
        sd = saved["model"]
        epoch = int(saved.get("epoch", 0))
        iteration = int(saved.get("iteration", 0))
    else:
        sd, epoch, iteration = saved, 0, 0
    params, stats = convert_state_dict(sd, log=log)
    return {"epoch": epoch, "iteration": iteration,
            "model": {"params": params, "batch_stats": stats}}


def import_torch_checkpoint(pth_path, ckpt_path, log=None):
    """``.pth`` file -> repo ``.ckpt`` (msgpack) the trainer/engine can
    reload via RELOAD_CHECKPOINT_PATH (tolerant_merge shape-checks every
    leaf on load, exactly like the reference loader)."""
    from .checkpoint import save_checkpoint

    state = load_torch_checkpoint(pth_path, log=log)
    save_checkpoint(ckpt_path, state)
    return state
