#!/usr/bin/env python
"""Parse hypredrive-tpu statistics tables from log files into CSV/plots.

Equivalent of the reference's scripts/analyze_statistics.py (parses the
STATISTICS SUMMARY table; ref: scripts/README.md): point it at one or
more solver logs (or files written via general.statistics_filename) and
get a tidy CSV plus optional per-metric plots.

Usage:
  python scripts/analyze_statistics.py run1.log run2.log -o stats.csv
  python scripts/analyze_statistics.py run.log --plot times.png
"""

from __future__ import annotations

import argparse
import csv
import re
import sys
from dataclasses import dataclass, asdict
from typing import List, Optional

ROW_RE = re.compile(
    r"^\|\s*(?P<entry>[\d.]+)\s*\|"
    r"\s*(?P<build>[\d.]*)\s*\|"
    r"\s*(?P<setup>[\d.]*)\s*\|"
    r"\s*(?P<solve>[\d.]*)\s*\|"
    r"\s*(?P<res0>[\deE.+-]*)\s*\|"
    r"\s*(?P<relres>[\deE.+-]*)\s*\|"
    r"\s*(?P<iters>\d+)\s*\|\s*$")
HEADER_RE = re.compile(r"STATISTICS SUMMARY(?: for (?P<name>.+?))?:")
UNIT_RE = re.compile(r"times \[(?P<unit>ms|s)\]")


@dataclass
class StatsRow:
    source: str
    run: str
    entry: str
    build_time: Optional[float]
    setup_time: Optional[float]
    solve_time: Optional[float]
    initial_res_norm: Optional[float]
    rel_res_norm: Optional[float]
    iters: int
    unit: str


def parse_log(path: str) -> List[StatsRow]:
    rows: List[StatsRow] = []
    name = ""
    unit = "ms"
    with open(path) as f:
        for line in f:
            m = HEADER_RE.search(line)
            if m:
                name = m.group("name") or ""
                continue
            m = UNIT_RE.search(line)
            if m:
                unit = m.group("unit")
                continue
            m = ROW_RE.match(line.rstrip())
            if m:
                g = m.groupdict()

                def fl(key):
                    return float(g[key]) if g[key] else None

                rows.append(StatsRow(
                    source=path, run=name, entry=g["entry"],
                    build_time=fl("build"), setup_time=fl("setup"),
                    solve_time=fl("solve"), initial_res_norm=fl("res0"),
                    rel_res_norm=fl("relres"), iters=int(g["iters"]),
                    unit=unit))
    return rows


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("logs", nargs="+", help="log / statistics files")
    ap.add_argument("-o", "--output", default=None, help="CSV output path")
    ap.add_argument("--plot", default=None, help="write a times/iters plot")
    args = ap.parse_args(argv)

    rows: List[StatsRow] = []
    for path in args.logs:
        rows.extend(parse_log(path))
    if not rows:
        print("no statistics tables found", file=sys.stderr)
        return 1

    out = args.output or "/dev/stdout"
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(asdict(rows[0]).keys()))
        w.writeheader()
        for r in rows:
            w.writerow(asdict(r))

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4.5))
        xs = range(len(rows))
        for key, label in (("build_time", "LS build"),
                           ("setup_time", "setup"),
                           ("solve_time", "solve")):
            ys = [getattr(r, key) for r in rows]
            ax1.plot(xs, ys, marker="o", label=label)
        ax1.set_xlabel("entry")
        ax1.set_ylabel(f"time [{rows[0].unit}]")
        ax1.legend()
        ax1.grid(alpha=0.4)
        ax2.plot(xs, [r.iters for r in rows], marker="s", color="#D55E00")
        ax2.set_xlabel("entry")
        ax2.set_ylabel("iterations")
        ax2.grid(alpha=0.4)
        fig.tight_layout()
        fig.savefig(args.plot, dpi=160)
        print(f"wrote {args.plot}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
