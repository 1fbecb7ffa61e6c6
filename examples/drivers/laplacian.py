#!/usr/bin/env python
"""Laplacian example driver.

Mirrors the reference's C_laplacian application (ref:
examples/src/C_laplacian/laplacian.c; golden output
examples/refOutput/laplacian.txt — PCG + AMG "poisson" preset, 5 iters):
generates a 7-point 3-D Laplacian in library mode, applies the built-in
``poisson`` preconditioner preset, and runs a configurable number of
repeated solves.

Usage:  python examples/drivers/laplacian.py [-n 30] [--solves 5]
            [-i config.yml] [-p poisson]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import hypredrive_tpu as hd
from hypredrive_tpu.ops.csr import laplacian_3d_7pt

DEFAULT_CONFIG = """
general:
  name: laplacian
  use_millisec: on

linear_system:
  rhs_mode: ones

solver:
  pcg:
    max_iter: 100
    relative_tol: 1.0e-6
    print_level: 0

preconditioner:
  preset: poisson
"""


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("-n", type=int, default=30, help="grid points per side")
    ap.add_argument("--solves", type=int, default=5)
    ap.add_argument("-i", "--input", default=None,
                    help="YAML config (default: built-in poisson preset)")
    args = ap.parse_args(argv)

    A = laplacian_3d_7pt(args.n)
    n = A.shape[0]
    print(f"Assembling 7-pt Laplacian: {n} rows, {A.nnz} nonzeros")

    drv = hd.HypreDrive()
    try:
        drv.set_library_mode()
        drv.input_args_parse(args.input if args.input else DEFAULT_CONFIG)
        drv.set_matrix_from_csr(A.indptr, A.indices, A.data)
        drv.set_rhs(np.ones(n))

        for i in range(args.solves):
            print(f"Solve {i + 1}/{args.solves}...")
            drv.annotate_begin("Run", i)
            drv.reset_initial_guess()
            drv.precon_create()
            drv.linear_solver_create()
            drv.linear_solver_setup()
            drv.linear_solver_apply()
            drv.precon_destroy()
            drv.linear_solver_destroy()
            drv.annotate_end("Run", i)

        drv.stats_print()
        return 0
    finally:
        drv.destroy()


if __name__ == "__main__":
    sys.exit(main())
