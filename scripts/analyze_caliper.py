#!/usr/bin/env python
"""Analyze profiler traces (the Caliper-equivalent report).

The reference post-processes Caliper .cali region timings
(ref: scripts/analyze_caliper.py); this framework's tracing backend is
the JAX profiler (scripts/profile_solve.py writes its traces), whose
trace.json.gz files this script reduces to the same kind of per-region
table: total time, call count, and share per annotated span / XLA op
class.

Usage:
  python scripts/analyze_caliper.py /tmp/jax-trace-dir [-n 25] [--csv out]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys


def load_trace_events(trace_dir: str):
    pats = [os.path.join(trace_dir, "**", "*.trace.json.gz"),
            os.path.join(trace_dir, "**", "*.trace.json"),
            trace_dir]
    files = []
    for p in pats:
        files += [f for f in glob.glob(p, recursive=True)
                  if f.endswith((".json", ".json.gz"))]
    if not files:
        raise SystemExit(f"no trace json under {trace_dir} "
                         "(run scripts/profile_solve.py first)")
    events = []
    for f in sorted(set(files)):
        op = gzip.open if f.endswith(".gz") else open
        with op(f, "rt") as fh:
            doc = json.load(fh)
        events += doc.get("traceEvents", [])
    return events


def classify(name: str) -> str:
    for key in ("fusion", "copy", "all-reduce", "all-gather", "ppermute",
                "dynamic-slice", "dot", "scatter", "gather", "custom-call",
                "while", "convert"):
        if key in name.lower():
            return key
    return name.split(".")[0][:40]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("trace_dir")
    ap.add_argument("-n", "--top", type=int, default=25)
    ap.add_argument("--csv", default=None)
    ap.add_argument("--by-op", action="store_true",
                    help="group by individual op name instead of class")
    args = ap.parse_args(argv)

    events = load_trace_events(args.trace_dir)

    # annotated regions first: the stats annotator's TraceAnnotation
    # spans (hypredrv::<phase>) and the AMG cycle's per-level named
    # scopes — the direct analogue of the reference's Caliper region
    # report (ref: include/internal/stats.h:47-80)
    ann_total = collections.Counter()
    ann_count = collections.Counter()
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        name = ev.get("name", "?")
        if name.startswith("hypredrv::") or "amg_L" in name:
            key = name if name.startswith("hypredrv::") else \
                "amg_L" + name.split("amg_L", 1)[1].split("/")[0]
            ann_total[key] += ev["dur"]
            ann_count[key] += 1
    if ann_total:
        print("annotated regions (hypredrv phases + amg levels):")
        print(f"{'region':<42} {'total[ms]':>10} {'count':>8}")
        print("-" * 62)
        for name, us in ann_total.most_common():
            print(f"{name:<42} {us/1e3:>10.2f} {ann_count[name]:>8}")
        print()

    total = collections.Counter()
    counts = collections.Counter()
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        name = ev.get("name", "?")
        key = name if args.by_op else classify(name)
        total[key] += ev["dur"]
        counts[key] += 1
    grand = sum(total.values()) or 1
    rows = total.most_common(args.top)
    print(f"{'region':<42} {'total[ms]':>10} {'count':>8} {'share':>7}")
    print("-" * 70)
    for name, us in rows:
        print(f"{name:<42} {us/1e3:>10.2f} {counts[name]:>8} "
              f"{100.0*us/grand:>6.1f}%")
    if args.csv:
        with open(args.csv, "w") as f:
            f.write("region,total_ms,count,share\n")
            for name, us in total.most_common():
                f.write(f"\"{name}\",{us/1e3:.3f},{counts[name]},"
                        f"{us/grand:.4f}\n")
        print(f"wrote {args.csv}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
