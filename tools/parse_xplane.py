"""Summarize a jax.profiler xplane trace: device-time share per op bucket.

Usage:
    python tools/parse_xplane.py <trace_dir> [top_n]

Parses the .xplane.pb written by `jax.profiler.trace` (set
BENCH_PROFILE_DIR for bench.py to capture one) with the xplane_pb2 schema
shipped inside the installed tensorflow wheel, aggregates XLA op durations
on the TPU device plane by fusion name, and prints a sorted table plus
coarse buckets (matmul / attention softmax / layernorm / rotary / other).
This is the committed replacement for the ad-hoc round-1 profile tooling
(BENCH_NOTES.md's sampler profile table came from the same xplane data).
"""

from __future__ import annotations

import collections
import glob
import os
import sys


def _load_xspace(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # in-venv schema

    pats = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not pats:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(pats[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def _bucket(name: str) -> str:
    # Classify on the op's own name and kind token, NOT the full HLO text:
    # the operand list embeds other ops' names (`custom-call(%copy-done.625,
    # ...)`) which misread the r4 train-stack profile as "67.5% layout" when
    # ~50% of the step was actually inside the Pallas train kernels. The op
    # kind appears as ` <kind>(` between the result type and the operand
    # list; operand references (`%copy-done.625`) never match ` <kind>(`.
    lhs = name.split("=", 1)[0].lower()  # `%opname ` — fusion ops carry hints
    # ADVICE r4: also match bare-op-name events (`custom-call.123` with no
    # `= kind(operands)` text) — checking the lhs is safe because operand
    # references only appear right of the `=`.
    if " custom-call(" in name or "custom-call" in lhs:
        return "custom-call (pallas)"
    if "fusion" in lhs and ("dot" in lhs or "conv" in lhs):
        return "matmul-fusion"
    for key, b in (
        ("dot", "matmul"), ("softmax", "softmax"), ("reduce", "reduce/LN"),
        ("convert", "convert"), ("transpose", "layout"), ("copy", "layout"),
        ("scatter", "scatter"), ("gather", "gather"), ("rsqrt", "reduce/LN"),
        ("erf", "gelu"), ("concatenate", "layout"),
    ):
        if f" {key}(" in name or key in lhs:
            return b
    return "other"


def main() -> None:
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    xs = _load_xspace(trace_dir)

    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = {mid: plane.event_metadata[mid].name for mid in plane.event_metadata}
        print(f"\n== plane: {plane.name} lines: "
              + ", ".join(f"{ln.name}({len(ln.events)})" for ln in plane.lines))
        durs: dict[str, int] = collections.Counter()
        for line in plane.lines:
            # only the leaf op line — module/step lines are parents and
            # copy/slice-start lines are async DMA that overlaps compute
            if line.name not in ("XLA Ops",):
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                durs[name] += ev.duration_ps
        if not durs:
            continue
        total = sum(durs.values())
        print(f"\n== plane: {plane.name}  total {total/1e12*1000:.3f} ms device time")
        buckets: dict[str, int] = collections.Counter()
        for name, d in durs.items():
            buckets[_bucket(name)] += d
        print("-- buckets:")
        for b, d in sorted(buckets.items(), key=lambda kv: -kv[1]):
            print(f"  {d/total*100:5.1f}%  {b}")
        print(f"-- top {top_n} ops:")
        for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:top_n]:
            print(f"  {d/total*100:5.1f}%  {d/1e9:8.3f} ms  {name[:90]}")
        # per-bucket leaders: the overall top-N hides what "layout"/"other"
        # are made of, which is exactly what a fusion attack needs to know
        print("-- top ops per bucket:")
        per = collections.defaultdict(list)
        for name, d in durs.items():
            per[_bucket(name)].append((d, name))
        for b, items in sorted(per.items(), key=lambda kv: -sum(d for d, _ in kv[1])):
            print(f"   [{b}]")
            for d, name in sorted(items, reverse=True)[:6]:
                print(f"     {d/total*100:5.1f}%  {d/1e9:8.3f} ms  {name[:100]}")


if __name__ == "__main__":
    main()
