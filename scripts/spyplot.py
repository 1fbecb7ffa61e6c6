#!/usr/bin/env python
"""Sparsity-pattern plot of a matrix file (IJ ASCII/binary/multipart/MTX).

Equivalent of the reference's scripts/spyplot.py; uses the framework's
own readers so every supported on-disk format works.

Usage:
  python scripts/spyplot.py data/ps3d10pt7/np1/IJ.out.A -o spy.png
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("matrix", help="matrix file or multipart prefix")
    ap.add_argument("-o", "--output", default=None)
    ap.add_argument("--markersize", type=float, default=None)
    args = ap.parse_args(argv)

    from hypredrive_tpu.io.ij import read_matrix_auto

    A, _ = read_matrix_auto(args.matrix)
    print(f"{args.matrix}: {A.shape[0]} x {A.shape[1]}, {A.nnz} nonzeros "
          f"({A.nnz / A.shape[0]:.1f} per row)")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ms = args.markersize or max(0.05, min(2.0, 2e5 / max(A.nnz, 1)))
    fig, ax = plt.subplots(figsize=(7, 7))
    ax.spy(A, markersize=ms, color="#0072B2")
    ax.set_title(os.path.basename(args.matrix))
    out = args.output or os.path.basename(args.matrix) + ".spy.png"
    fig.tight_layout()
    fig.savefig(out, dpi=160)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
