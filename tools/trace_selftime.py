#!/usr/bin/env python3
"""Exclusive (self) device time per op from a jax.profiler trace.

parse_trace.py sums raw durations, which double-counts nested spans
(module > fusion > kernel). This tool nests the intervals per device
lane and attributes each parent only the time not covered by children,
then groups by cleaned op name — the per-step budget becomes additive.

Usage: python tools/trace_selftime.py /tmp/prof_dir [n_steps]
"""

import collections
import re
import sys

from parse_trace import load_trace


def clean(name):
    name = re.sub(r"\.\d+$", "", name)
    name = re.sub(r"\(\d+\)", "", name)
    return name


def main():
    root = sys.argv[1]
    steps = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
    data = load_trace(root)
    events = data.get("traceEvents", [])
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    device_pids = {pid for pid, name in pid_name.items()
                   if "TPU" in name or "/device" in name.lower()}

    by_tid = collections.defaultdict(list)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            by_tid[(e["pid"], e.get("tid"))].append(e)

    self_time = collections.Counter()
    for evs in by_tid.values():
        evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []  # [end, name, dur, child_sum]
        def close_until(ts):
            while stack and stack[-1][0] <= ts + 1e-9:
                end, nm, dur, csum = stack.pop()
                self_time[nm] += max(0.0, dur - csum)
                if stack:
                    stack[-1][3] += dur
        for e in evs:
            ts, dur = e["ts"], e.get("dur", 0)
            close_until(ts)
            stack.append([ts + dur, clean(e.get("name", "?")), dur, 0.0])
        close_until(float("inf"))

    total = sum(self_time.values())
    print(f"total device self-time {total/1e3:.1f} ms "
          f"({total/1e3/steps:.1f} ms/step over {steps:g} steps)\n")
    print(f"{'ms/step':>9}  {'%':>5}  op")
    for nm, us in self_time.most_common(40):
        print(f"{us/1e3/steps:9.2f}  {100*us/total:5.1f}  {nm}")


if __name__ == "__main__":
    main()
