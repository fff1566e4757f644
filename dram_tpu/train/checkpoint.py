"""Checkpointing: msgpack pytrees with tolerant shape-checked restore.

Replaces the reference torch.save/load + tolerant state-dict merge
(reference job_runner.py:252-288, 457-497): checkpoints are nested dicts of
arrays serialized with flax msgpack; `tolerant_merge` reproduces the
reference reload semantics — drop saved entries that are missing from or
shape-mismatched with the current tree (logging them), honour
`ignored_keys`, and support an overwrite mode for metric dicts.
"""

from __future__ import annotations

import glob
import os

import numpy as np
from flax import serialization


def save_checkpoint(path, tree):
    """Atomically write a nested dict-of-arrays as msgpack."""
    data = serialization.msgpack_serialize(tree)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as fp:
        fp.write(data)
    os.replace(tmp, path)


def load_checkpoint(path):
    with open(path, "rb") as fp:
        return serialization.msgpack_restore(fp.read())


def newest_checkpoint(exp_path, pattern="*.ckpt"):
    """Latest checkpoint file in a directory; None if there is none.

    Resumes by the epoch number parsed from the ``{epoch}.ckpt`` stem when
    available — strictly better than the reference's mtime-newest ``.pth``
    rule (job_runner.py:433-437), which a restored/copied old checkpoint
    can hijack. Non-numeric names fall back to ctime ordering and always
    rank below any epoch-named checkpoint.
    """
    files = glob.glob(os.path.join(exp_path, pattern))
    if not files:
        return None

    def rank(path):
        stem = os.path.splitext(os.path.basename(path))[0]
        try:
            return (1, int(stem), 0.0)
        except ValueError:
            return (0, 0, os.path.getctime(path))

    return max(files, key=rank)


def tolerant_merge(current, saved, ignored_keys=(), overwrite=False,
                   log=None, _prefix=""):
    """Merge `saved` into `current` (both nested dicts), dropping entries
    that are missing or shape-mismatched. Returns a new tree."""
    if overwrite:
        out = dict(current) if isinstance(current, dict) else {}
        out.update(saved)
        return out
    if not isinstance(current, dict) or not isinstance(saved, dict):
        return current
    out = {}
    for k, cv in current.items():
        key = f"{_prefix}{k}"
        if k not in saved:
            out[k] = cv
            continue
        sv = saved[k]
        if key in ignored_keys or k in ignored_keys:
            if log:
                log(f"ignore key: {key}")
            out[k] = cv
        elif isinstance(cv, dict):
            out[k] = tolerant_merge(cv, sv, ignored_keys, False, log,
                                    _prefix=key + "/")
        elif hasattr(cv, "shape"):
            if hasattr(sv, "shape") and tuple(np.shape(sv)) == tuple(np.shape(cv)):
                out[k] = np.asarray(sv).astype(np.asarray(cv).dtype)
            else:
                if log:
                    log(f"in {key}, saved shape {np.shape(sv)} does not match "
                        f"current shape {np.shape(cv)}")
                out[k] = cv
        else:
            out[k] = sv
    return out
