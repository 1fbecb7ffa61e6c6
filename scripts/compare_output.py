#!/usr/bin/env python
"""Compare a solver output against a reference output, ignoring times.

Equivalent of the reference's scripts/compare_output.sh (ref:
compare_output.sh:41-66): both files are normalized — timestamps,
version strings, absolute paths, and every timing column are masked —
then diffed.  Iteration counts and residual norms are the contract.

Usage:
  python scripts/compare_output.py actual.log reference.log
Exit code 0 = match, 1 = differences (printed as a unified diff).
"""

from __future__ import annotations

import argparse
import difflib
import re
import sys

_NORMALIZERS = [
    # timestamps
    (re.compile(r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}"), "DATE TIME"),
    # version banner
    (re.compile(r"hypredrive-tpu v[\d.]+\S*"), "hypredrive-tpu vX.Y.Z"),
    # absolute paths
    (re.compile(r"(/[\w.+-]+)+/"), "PATH/"),
    # timing cells inside stats tables: mask the three time columns but
    # keep the residual-norm and iters columns intact
    (re.compile(r"(?<=\|)\s*\d+\.\d{3}\s*(?=\|)"), "   T   "),
    # free-standing "... in 1.234 s/ms" phrases
    (re.compile(r"\d+\.\d+\s*(ms|s)\b"), "T \\1"),
]


def normalize(text: str) -> str:
    out = []
    for line in text.splitlines():
        for pat, rep in _NORMALIZERS:
            line = pat.sub(rep, line)
        out.append(line.rstrip())
    return "\n".join(out) + "\n"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("actual")
    ap.add_argument("reference")
    args = ap.parse_args(argv)

    with open(args.actual) as f:
        a = normalize(f.read())
    with open(args.reference) as f:
        b = normalize(f.read())
    if a == b:
        print("outputs match (times normalized away)")
        return 0
    diff = difflib.unified_diff(
        b.splitlines(keepends=True), a.splitlines(keepends=True),
        fromfile=args.reference, tofile=args.actual)
    sys.stdout.writelines(diff)
    return 1


if __name__ == "__main__":
    sys.exit(main())
