#!/usr/bin/env python
"""Plot an eigenvalue spectrum written by linear_system.eigspec.

Equivalent of the reference's scripts/eigplot.py: reads the
``<prefix>_eigenvalues.txt`` file (count header, then one real — or
"real imag" — eigenvalue per line; linsys/eigspec.py) and produces a
complex-plane scatter or a real-line plot.

Usage:
  python scripts/eigplot.py eig_eigenvalues.txt -o eig.png
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def read_eigenvalues(path: str) -> np.ndarray:
    with open(path) as f:
        n = int(f.readline())
        vals = []
        for _ in range(n):
            parts = f.readline().split()
            if len(parts) == 2:
                vals.append(complex(float(parts[0]), float(parts[1])))
            else:
                vals.append(complex(float(parts[0]), 0.0))
    return np.asarray(vals)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("eigfile")
    ap.add_argument("-o", "--output", default=None)
    args = ap.parse_args(argv)

    w = read_eigenvalues(args.eigfile)
    re, im = w.real, w.imag
    print(f"{len(w)} eigenvalues | min Re {re.min():.3e} max Re {re.max():.3e}"
          f" | max |Im| {np.abs(im).max():.3e}")
    if (re > 0).all():
        print(f"condition estimate (Re): {re.max() / re.min():.3e}")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    if np.abs(im).max() > 1e-14:
        ax.scatter(re, im, s=12, color="#0072B2", alpha=0.7)
        ax.set_xlabel("Re(λ)")
        ax.set_ylabel("Im(λ)")
        ax.axhline(0, color="gray", lw=0.5)
        ax.axvline(0, color="gray", lw=0.5)
    else:
        ax.semilogy(np.arange(1, len(w) + 1), np.sort(re), ".",
                    color="#0072B2")
        ax.set_xlabel("index")
        ax.set_ylabel("λ")
    ax.grid(alpha=0.4)
    out = args.output or os.path.basename(args.eigfile) + ".png"
    fig.tight_layout()
    fig.savefig(out, dpi=160)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
