#!/usr/bin/env python
"""Aggregate a jax.profiler trace: device-op durations grouped by op name.

Usage:  python tools/parse_trace.py /tmp/trace_dir [--top 40] [--by source]

Roofline mode (per-fusion achieved HBM bandwidth / per-conv achieved FLOPs):

    ISEG_JIT_CACHE=/tmp/fresh_cache \
    XLA_FLAGS=--xla_dump_to=/tmp/hlo python tools/profile_train.py --trace /tmp/tr ...
    python tools/parse_trace.py /tmp/tr --roofline /tmp/hlo [--module jit_step]

The dump must come from a FRESH compile (cached executables don't re-dump),
hence the throwaway ISEG_JIT_CACHE. Bytes per instruction are modeled as
sum(operand buffers) + sum(result buffers) — the HBM traffic of a fusion that
reads every operand once and writes its outputs once (an upper bound when an
operand is consumed twice inside one fusion, an underbound never). "%peak"
compares against the chip's HBM bandwidth / bf16 matmul peak so
"bandwidth-bound" is a measured claim, not an inference.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re

# TPU v5e (1 chip): ~819 GB/s HBM, ~197 bf16 TFLOP/s
PEAK_GBPS = 819.0
PEAK_TFLOPS = 197.0

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16,
}

_SHAPE_RE = re.compile(r"\b(" + "|".join(_DTYPE_BYTES) + r")\[([0-9,]*)\]")


def _shape_bytes(text: str) -> int:
    """Total byte size of every dtype[dims] shape literal in `text`."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def _conv_flops(line: str) -> int:
    """2 * out_elems * kh * kw * Cin / groups for an HLO convolution line."""
    m = re.match(r"\s*(?:ROOT )?%?\S+ = \(?([a-z0-9]+)\[([0-9,]*)\]", line)
    if not m:
        return 0
    out_dims = [int(d) for d in m.group(2).split(",") if d]
    out_elems = 1
    for d in out_dims:
        out_elems *= d
    wm = re.search(r"window=\{[^}]*size=([0-9x]+)", line)
    ksize = 1
    if wm:
        for k in wm.group(1).split("x"):
            ksize *= int(k)
    gm = re.search(r"feature_group_count=(\d+)", line)
    groups = int(gm.group(1)) if gm else 1
    # Cin from the second (kernel) operand: dim_labels like b01f_01io->b01f;
    # kernel shape's 'i' dim = Cin/groups already, so use it directly.
    ops = re.findall(_SHAPE_RE, line.split("convolution(", 1)[-1])
    cin_per_group = None
    dl = re.search(r"dim_labels=([^_,\s]+)_([^-,\s]+)->", line)
    if dl and len(ops) >= 2:
        kern_labels = dl.group(2)
        km = re.search(r"convolution\(([^)]*)\)", line)
        if km:
            shapes = _SHAPE_RE.findall(km.group(1))
            if len(shapes) >= 2 and "i" in kern_labels:
                kdims = [int(d) for d in shapes[1][1].split(",") if d]
                if len(kdims) == len(kern_labels):
                    cin_per_group = kdims[kern_labels.index("i")]
    if cin_per_group is None:
        cin_per_group = 1
    return 2 * out_elems * ksize * cin_per_group


def _load_hlo_instructions(dump_dir: str, module_filter: str | None):
    """{instr_name: (bytes, flops, op_kind)} from the post-optimization HLO
    text dump. When several modules match, the LARGEST file wins for
    conflicting names (the full train step dominates the dump)."""
    paths = [p for p in glob.glob(os.path.join(dump_dir, "*after_optimization*.txt"))]
    if module_filter:
        paths = [p for p in paths if module_filter in os.path.basename(p)]
    if not paths:
        raise SystemExit(f"no *after_optimization*.txt under {dump_dir} "
                         f"(filter={module_filter!r}); dump with "
                         "XLA_FLAGS=--xla_dump_to=... and a FRESH compile cache")
    paths.sort(key=os.path.getsize)          # largest parsed last -> wins
    instrs = {}
    instr_re = re.compile(r"^\s+(?:ROOT )?%?([\w.\-]+) = ")
    for path in paths:
        with open(path) as f:
            for line in f:
                m = instr_re.match(line)
                if not m:
                    continue
                name = m.group(1)
                op = "conv" if " convolution(" in line else (
                    "fusion" if " fusion(" in line else (
                        "copy" if " copy(" in line else "other"))
                flops = _conv_flops(line) if op == "conv" else 0
                # custom-call/pallas lines keep their operand+result shapes
                # inline too, so the bytes model applies uniformly
                instrs[name] = (_shape_bytes(line), flops, op)
    return instrs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--by", choices=["name", "source"], default="name")
    ap.add_argument("--raw", action="store_true", help="no name canonicalization")
    ap.add_argument("--roofline", metavar="HLO_DUMP_DIR", default=None,
                    help="join per-instruction durations with an XLA HLO text "
                         "dump: print achieved GB/s (and TFLOP/s for convs) "
                         "per instruction vs chip peaks")
    ap.add_argument("--module", default=None,
                    help="substring filter on the HLO dump filename "
                         "(e.g. 'jit_step')")
    ap.add_argument("--peak-gbps", type=float, default=PEAK_GBPS)
    ap.add_argument("--peak-tflops", type=float, default=PEAK_TFLOPS)
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
    cnt = collections.Counter()
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        name = ev.get("name", "?")
        if args.roofline:
            name = name.lstrip("%")
        elif args.by == "source":
            name = ev.get("args", {}).get("source", name)
        elif not args.raw:
            # canonicalize fusion.123 -> fusion, strip trailing digits
            name = re.sub(r"[.\d]+$", "", name)
        agg[name] += dur
        cnt[name] += 1
        total += dur

    print(f"{path}\ntotal device time: {total:.2f} ms\n")
    if not args.roofline:
        for name, ms in agg.most_common(args.top):
            print(f"{ms:10.2f} ms  {100 * ms / max(total, 1e-9):5.1f}%  {name}")
        return

    instrs = _load_hlo_instructions(args.roofline, args.module)
    matched = 0
    rows = []
    for name, ms in agg.most_common():
        info = instrs.get(name)
        if info is None:
            rows.append((ms, name, None))
            continue
        matched += ms
        nbytes, flops, op = info
        per_exec_ms = ms / max(cnt[name], 1)
        gbps = nbytes / (per_exec_ms * 1e-3) / 1e9
        tflops = flops / (per_exec_ms * 1e-3) / 1e12
        rows.append((ms, name, (op, nbytes, gbps, tflops)))
    print(f"matched {matched:.2f} ms ({100 * matched / max(total, 1e-9):.1f}%) "
          f"of device time against the HLO dump\n")
    print(f"{'total ms':>9} {'%':>5} {'op':>6} {'MB/exec':>8} {'GB/s':>7} "
          f"{'%BWpk':>6} {'TFLOP/s':>8} {'%MXUpk':>6}  name")
    for ms, name, info in rows[:args.top]:
        if info is None:
            print(f"{ms:9.2f} {100 * ms / max(total, 1e-9):5.1f} {'?':>6} "
                  f"{'-':>8} {'-':>7} {'-':>6} {'-':>8} {'-':>6}  {name}")
            continue
        op, nbytes, gbps, tflops = info
        print(f"{ms:9.2f} {100 * ms / max(total, 1e-9):5.1f} {op:>6} "
              f"{nbytes / 1e6:8.2f} {gbps:7.1f} "
              f"{100 * gbps / args.peak_gbps:6.1f} "
              f"{tflops:8.2f} {100 * tflops / args.peak_tflops:6.1f}  {name}")


if __name__ == "__main__":
    main()
