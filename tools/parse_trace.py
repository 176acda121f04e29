#!/usr/bin/env python
"""Aggregate a jax.profiler trace: device-op durations grouped by op name.

Usage:  python tools/parse_trace.py /tmp/trace_dir [--top 40] [--by source]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--by", choices=["name", "source"], default="name")
    ap.add_argument("--raw", action="store_true", help="no name canonicalization")
    args = ap.parse_args()

    paths = glob.glob(os.path.join(args.trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {args.trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)

    events = data.get("traceEvents", [])
    # find TPU/device process ids (names like "/device:TPU:0" or "TPU:0")
    dev_pids = set()
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pname = ev.get("args", {}).get("name", "")
            if "TPU" in pname or "device" in pname.lower():
                dev_pids.add(ev["pid"])

    agg = collections.Counter()
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        name = ev.get("name", "?")
        if args.by == "source":
            name = ev.get("args", {}).get("source", name)
        elif not args.raw:
            # canonicalize fusion.123 -> fusion, strip trailing digits
            name = re.sub(r"[.\d]+$", "", name)
        agg[name] += dur
        total += dur

    print(f"{path}\ntotal device time: {total:.2f} ms\n")
    for name, ms in agg.most_common(args.top):
        print(f"{ms:10.2f} ms  {100 * ms / max(total, 1e-9):5.1f}%  {name}")


if __name__ == "__main__":
    main()
