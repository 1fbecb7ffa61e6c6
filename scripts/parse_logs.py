#!/usr/bin/env python
"""Parse and analyze hypredrive-tpu diagnostic logs.

Equivalent of the reference's scripts/parse_logs.py: the ``block_norms``
mode extracts the per-dof-block Frobenius/residual-norm diagnostics the
framework emits at ``HYPREDRV_LOG_LEVEL>=3`` (multiphysics debugging),
and ``stats`` extracts STATISTICS SUMMARY rows — both to CSV.

Usage:
  python scripts/parse_logs.py block_norms run.log [-o norms.csv]
  python scripts/parse_logs.py stats run.log [-o stats.csv]
"""

import argparse
import csv
import re
import sys

_NUM = r"[-+]?(?:\d+(?:\.\d*)?|\.\d+)(?:[eE][-+]?\d+)?"

_BLOCK = re.compile(
    rf"block\s+(?P<name>[\w-]+)\s*\(id=(?P<id>-?\d+)\)\s*[:=]\s*"
    rf"(?P<norm>{_NUM})", re.IGNORECASE)
_STATS_ROW = re.compile(
    rf"^\|\s*(?P<entry>[\d.]+)\s*\|\s*(?P<build>{_NUM})?\s*\|\s*"
    rf"(?P<setup>{_NUM})?\s*\|\s*(?P<solve>{_NUM})?\s*\|\s*"
    rf"(?P<initial>{_NUM})\s*\|\s*(?P<relative>{_NUM})\s*\|\s*"
    rf"(?P<iters>\d+)\s*\|")


def parse_block_norms(lines):
    rows = []
    snapshot = 0
    for line in lines:
        if "block" in line.lower() and "norm" in line.lower() \
                and "frobenius" in line.lower():
            snapshot += 1
        for m in _BLOCK.finditer(line):
            rows.append({"snapshot": snapshot, "block": m.group("name"),
                         "id": int(m.group("id")),
                         "norm": float(m.group("norm"))})
    return rows, ["snapshot", "block", "id", "norm"]


def parse_stats(lines):
    rows = []
    for line in lines:
        m = _STATS_ROW.match(line.strip())
        if m:
            d = m.groupdict()
            rows.append({k: (v if v is not None else "")
                         for k, v in d.items()})
    return rows, ["entry", "build", "setup", "solve", "initial",
                  "relative", "iters"]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("mode", choices=["block_norms", "stats"])
    ap.add_argument("logfile")
    ap.add_argument("-o", "--output", default=None)
    args = ap.parse_args(argv)

    with open(args.logfile) as f:
        lines = f.readlines()
    rows, fields = (parse_block_norms(lines) if args.mode == "block_norms"
                    else parse_stats(lines))
    out = open(args.output, "w", newline="") if args.output else sys.stdout
    w = csv.DictWriter(out, fieldnames=fields)
    w.writeheader()
    for r in rows:
        w.writerow(r)
    if args.output:
        out.close()
        print(f"wrote {len(rows)} rows to {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
