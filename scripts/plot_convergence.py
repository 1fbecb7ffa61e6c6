#!/usr/bin/env python
"""Run a config and plot the Krylov residual-norm history.

Equivalent of the reference's scripts/plot_convergence.py (which parses
hypre print_level output); here the solvers return the history directly
(solvers/base.py res_history), so this script runs the solve itself.

Usage:
  python scripts/plot_convergence.py examples/ex1.yml -o conv.png
  python scripts/plot_convergence.py cfg1.yml cfg2.yml -o cmp.png
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def run_config(path: str):
    import hypredrive_tpu as hd

    drv = hd.HypreDrive()
    try:
        drv.input_args_parse(path)
        drv.linear_system_build()
        drv.precon_create()
        drv.linear_solver_create()
        drv.linear_solver_setup()
        res = drv.linear_solver_apply()
        hist = np.asarray(res.res_history, dtype=float)
        hist = hist[np.isfinite(hist)]
        return hist, res
    finally:
        drv.destroy()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("configs", nargs="+", help="YAML config files")
    ap.add_argument("-o", "--output", default="convergence.png")
    ap.add_argument("--relative", action="store_true", default=True,
                    help="normalize by the initial residual (default)")
    args = ap.parse_args(argv)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    for cfg in args.configs:
        hist, res = run_config(cfg)
        if hist.size == 0:
            print(f"{cfg}: no residual history", file=sys.stderr)
            continue
        ys = hist / hist[0] if args.relative and hist[0] > 0 else hist
        label = os.path.basename(cfg)
        ax.semilogy(range(len(ys)), ys, marker="o", markersize=4,
                    label=f"{label} ({res.iters} iters)")
        print(f"{cfg}: {res.iters} iters, final relres {res.rel_res_norm:.3e}")
    ax.set_xlabel("iteration")
    ax.set_ylabel("relative residual norm" if args.relative
                  else "residual norm")
    ax.grid(alpha=0.4, which="both")
    ax.legend()
    fig.tight_layout()
    fig.savefig(args.output, dpi=160)
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
