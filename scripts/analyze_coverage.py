#!/usr/bin/env python
"""Analyze and gate Python test-coverage reports.

Equivalent of the reference's gcovr post-processor
(ref: scripts/analyze_coverage.py — parses coverage XML, applies
exclusion patterns, enforces per-file minimums): this one consumes a
``coverage.py`` JSON report over `hypredrive_tpu/`:

    python -m coverage run -m pytest tests/ -q
    python -m coverage json -o coverage.json
    python scripts/analyze_coverage.py coverage.json --min-file 60 --min-total 80

Exit code is non-zero when any gate fails, so CI can consume it
directly.  Files matching --exclude globs (default: interface shims
whose runtimes are absent from the image) are reported but not gated.
"""

from __future__ import annotations

import argparse
import fnmatch
import json
import sys

DEFAULT_EXCLUDES = [
    "*/tools/*",           # offline CLIs exercised as subprocesses
    "*/cli.py",            # covered via subprocess smoke runs
]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("report", help="coverage.py JSON report")
    ap.add_argument("--min-file", type=float, default=50.0,
                    help="minimum line coverage %% per file")
    ap.add_argument("--min-total", type=float, default=75.0,
                    help="minimum total line coverage %%")
    ap.add_argument("--exclude", action="append", default=None,
                    help="glob of files to report but not gate")
    ap.add_argument("-n", "--top", type=int, default=15,
                    help="show the N least-covered files")
    args = ap.parse_args(argv)
    excludes = args.exclude if args.exclude is not None else DEFAULT_EXCLUDES

    with open(args.report) as fh:
        doc = json.load(fh)
    files = doc.get("files", {})
    rows = []
    for path, info in files.items():
        if "hypredrive_tpu" not in path:
            continue
        pct = float(info["summary"]["percent_covered"])
        gated = not any(fnmatch.fnmatch(path, pat) for pat in excludes)
        rows.append((pct, path, gated))
    if not rows:
        print("no hypredrive_tpu files in report", file=sys.stderr)
        return 2
    rows.sort()
    total = float(doc["totals"]["percent_covered"])
    print(f"{'file':<60} {'cover':>7} {'gated':>6}")
    print("-" * 76)
    for pct, path, gated in rows[:args.top]:
        print(f"{path:<60} {pct:>6.1f}% {'yes' if gated else 'no':>6}")
    print(f"\ntotal: {total:.1f}% (gate: ≥{args.min_total}%)")

    failures = [(pct, path) for pct, path, gated in rows
                if gated and pct < args.min_file]
    status = 0
    for pct, path in failures:
        print(f"FAIL: {path} at {pct:.1f}% < {args.min_file}%")
        status = 1
    if total < args.min_total:
        print(f"FAIL: total {total:.1f}% < {args.min_total}%")
        status = 1
    if status == 0:
        print("coverage gates OK")
    return status


if __name__ == "__main__":
    raise SystemExit(main())
