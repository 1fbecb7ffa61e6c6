#!/usr/bin/env python
"""Transient convection-diffusion example driver.

Mirrors the reference's C_convdif application (ref:
examples/src/C_convdif/convdif.c): an implicit-Euler timestep loop over
−ε∆c + v·∇c + c/dt = c_prev/dt on a 2-D upwind grid, with a growing
timestep (the matrix changes every step while the sparsity pattern stays
fixed — the lsseq/pattern-dedup scenario).  Each step is wrapped in a
hierarchical ``timestep`` level annotation so the stats table shows the
``1.1``-style dotted paths of the reference output
(ref: examples/refOutput/convdif.txt).

Three solver configurations live next to this driver:
  convdif-gmres-amg.yml   classical AMG (R = Pᵀ) — degrades with Peclet
  convdif-gmres-ilu.yml   block-Jacobi ILU(0)
  convdif-gmres-air.yml   AMG with approximate ideal restriction (AIR)

Usage:  python examples/drivers/convdif.py [-i config.yml] [-n 40]
            [--steps 10] [--eps 1e-3] [-a sect:key value ...]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import hypredrive_tpu as hd
from hypredrive_tpu.ops.csr import convection_diffusion_2d

HERE = os.path.dirname(os.path.abspath(__file__))


def initial_condition(nx: int) -> np.ndarray:
    """Gaussian blob released near the inflow corner."""
    x = (np.arange(nx) + 1.0) / (nx + 1)
    X, Y = np.meshgrid(x, x, indexing="xy")
    c0 = np.exp(-80.0 * ((X - 0.2) ** 2 + (Y - 0.2) ** 2))
    return c0.ravel()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("-i", "--input", default=os.path.join(
        HERE, "convdif-gmres-air.yml"), help="YAML solver configuration")
    ap.add_argument("-n", type=int, default=40, help="grid points per side")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--eps", type=float, default=1e-3)
    ap.add_argument("--velocity", type=float, nargs=2, default=(1.0, 0.5))
    ap.add_argument("--dt0", type=float, default=0.01)
    ap.add_argument("--dt-growth", type=float, default=1.5)
    args = ap.parse_args(argv)

    n = args.n * args.n
    drv = hd.HypreDrive()
    try:
        drv.set_library_mode()
        drv.input_args_parse(args.input)

        c = initial_condition(args.n)
        t, dt = 0.0, args.dt0
        total_lin = 0
        for step in range(1, args.steps + 1):
            drv.annotate_level_begin("timestep", step)

            # backward Euler: (I/dt + K) c_new = c_old/dt — new values,
            # same pattern every step
            A = convection_diffusion_2d(args.n, eps=args.eps,
                                        velocity=args.velocity, dt=dt)
            drv.set_matrix_from_csr(A.indptr, A.indices, A.data)
            drv.set_rhs(c / dt)
            drv.set_initial_guess(c)  # warm start from previous state

            drv.precon_create()
            drv.linear_solver_create()
            drv.linear_solver_setup()
            res = drv.linear_solver_apply()
            c = drv.get_solution()
            drv.precon_destroy()
            drv.linear_solver_destroy()

            t += dt
            cfl = max(abs(args.velocity[0]), abs(args.velocity[1])) \
                * dt * (args.n + 1)
            total_lin += res.iters
            print(f"Time step: {step:3d} | Time: {t:.4e} | dt: {dt:.4e} | "
                  f"CFL: {cfl:8.2f} | Lin: {res.iters:3d} | "
                  f"min(c)= {c.min():.2e} max(c)= {c.max():.2e} "
                  f"mass={c.sum() / n:.6e}")
            dt *= args.dt_growth
            drv.annotate_level_end("timestep", step)

        print()
        print("Aggregate Summary:")
        print("-" * 62)
        print(f"Total number of timesteps:         {args.steps}")
        print(f"Total number of linear iterations: {total_lin}")
        print(f"Avg. LS iterations per timestep:   {total_lin / args.steps:.2f}")
        print("-" * 62)
        print()
        drv.stats_print()
        return 0
    finally:
        drv.destroy()


if __name__ == "__main__":
    sys.exit(main())
