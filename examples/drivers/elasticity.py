#!/usr/bin/env python
"""Linear-elasticity example driver.

Mirrors the reference's C_elasticity application (ref:
examples/src/C_elasticity/elasticity.c; golden output
examples/refOutput/elasticity.txt — PCG + AMG with rigid-body modes,
21 iters): assembles a 3-D Q1 hexahedral elasticity operator, computes
the six rigid-body modes as the AMG near-null-space, registers the
``elasticity_sdc_3d`` preset (function-filtered unknown coarsening, the
driver-local preset the reference registers at runtime), and runs
repeated solves.

Usage:  python examples/drivers/elasticity.py [--nx 12 --ny 6 --nz 6]
            [--solves 3] [-i config.yml]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import hypredrive_tpu as hd
from hypredrive_tpu.config.presets import register_precon_preset
from hypredrive_tpu.ops.csr import elasticity_3d, rigid_body_modes

DEFAULT_CONFIG = """
general:
  name: elasticity
  use_millisec: on

linear_system:
  rhs_mode: ones

solver:
  pcg:
    max_iter: 200
    relative_tol: 1.0e-6
    print_level: 0

preconditioner:
  preset: elasticity_sdc_3d
"""


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--nx", type=int, default=12)
    ap.add_argument("--ny", type=int, default=6)
    ap.add_argument("--nz", type=int, default=6)
    ap.add_argument("--solves", type=int, default=3)
    ap.add_argument("-i", "--input", default=None)
    args = ap.parse_args(argv)

    # driver-local preset, as the reference registers at runtime
    # (ref: elasticity.c RegisterExamplePreconPresets)
    register_precon_preset(
        "elasticity_sdc_3d",
        "amg:\n  coarsening:\n    num_functions: 3\n    strong_th: 0.8\n"
        "    filter_functions: on",
        "Elasticity 3D AMG with function filtering")

    print("=" * 53)
    print("          Linear Elasticity Problem Setup")
    print("=" * 53)
    print(f"Grid dimensions (cells): {args.nx} x {args.ny} x {args.nz}")
    print(f"Number of solves:        {args.solves}")
    print("=" * 53)

    print("Assembling linear system... ", end="", flush=True)
    A, coords = elasticity_3d(args.nx, args.ny, args.nz)
    rbm = rigid_body_modes(coords, ndim=3)
    n = A.shape[0]
    print(f"Done! ({n} rows, {A.nnz} nonzeros)")

    # interleaved xyz component labels drive num_functions coarsening
    dofmap = np.arange(n) % 3

    drv = hd.HypreDrive()
    try:
        drv.set_library_mode()
        drv.input_args_parse(args.input if args.input else DEFAULT_CONFIG)
        drv.set_matrix_from_csr(A.indptr, A.indices, A.data)
        drv.system.set_dofmap(dofmap)
        drv.set_near_nullspace([rbm[:, k] for k in range(rbm.shape[1])])
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
