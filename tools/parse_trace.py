#!/usr/bin/env python3
"""Summarise a jax.profiler trace: total device time per op category.

Usage: python tools/parse_trace.py /tmp/prof_dir
Reads the newest plugins/profile/<run>/*.trace.json.gz and prints the top
ops by summed duration on the device ("/device:TPU" lanes), grouped by a
cleaned op name, so the train-step time budget is attributable.
"""

import collections
import glob
import gzip
import json
import os
import re
import sys


def load_trace(root):
    cands = sorted(glob.glob(os.path.join(
        root, "plugins", "profile", "*", "*.trace.json.gz")))
    if not cands:
        raise SystemExit(f"no trace.json.gz under {root}")
    with gzip.open(cands[-1], "rt") as fp:
        return json.load(fp)


def main():
    root = sys.argv[1]
    data = load_trace(root)
    events = data.get("traceEvents", [])
    # map pid -> process name to find device lanes
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    device_pids = {pid for pid, name in pid_name.items()
                   if "TPU" in name or "/device" in name.lower()}

    per_op = collections.Counter()
    per_cat = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        total += dur
        per_op[name] += dur
        base = re.sub(r"[.\d]+$", "", name.split("/")[-1])
        per_cat[base] += dur
    n_steps = max(1, int(os.environ.get("TRACE_STEPS", "3")))
    print(f"device lanes: {[pid_name[p] for p in device_pids]}")
    print(f"total device time {total:.1f} ms over {n_steps} steps "
          f"({total / n_steps:.1f} ms/step)\n")
    print("top op categories (ms, all steps):")
    for name, ms in per_cat.most_common(25):
        print(f"  {ms:9.2f}  {100 * ms / max(total, 1e-9):5.1f}%  {name}")
    print("\ntop individual ops:")
    for name, ms in per_op.most_common(25):
        print(f"  {ms:9.2f}  {name[:110]}")


if __name__ == "__main__":
    main()
