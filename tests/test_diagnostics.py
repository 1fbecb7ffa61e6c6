"""Diagnostics-layer tests: xref error norms, per-block residual norms,
statistics file append, and end-to-end scaling effect.

Mirrors reference behaviors: error norms vs reference solution
(src/HYPREDRV.c:3322-3334), per-dof-block residual norms
(include/internal/linsys.h:214-228), general.statistics_filename append
(src/HYPREDRV.c:468-502), and pre-solve diagonal scaling
(src/internal/scaling.c).
"""

import os

import numpy as np
import pytest

import hypredrive_tpu as hd
from hypredrive_tpu.ops.csr import laplacian_2d_5pt, multiphysics_block_system


def _drive(cfg):
    drv = hd.HypreDrive()
    drv.input_args_from_dict(cfg)
    return drv


def test_randsol_xref_error_norm():
    """rhs_mode=randsol generates xref with b = A·xref; after solving,
    the error norm vs xref must be small and recorded on the result."""
    cfg = {
        "linear_system": {
            "generate": {"kind": "laplacian_5pt", "nx": 16},
            "rhs_mode": "randsol",
        },
        "solver": {"pcg": {"relative_tol": 1e-10, "max_iter": 200}},
        "preconditioner": "amg",
    }
    drv = _drive(cfg)
    try:
        s = drv.linear_system_build()
        assert s.xref is not None
        np.testing.assert_allclose(np.asarray(s.b),
                                   np.asarray(s.A.matvec(s.xref)), atol=1e-12)
        drv.precon_create(); drv.linear_solver_create()
        drv.linear_solver_setup()
        res = drv.linear_solver_apply()
        assert res.converged
        assert res.error_norm is not None and res.error_norm < 1e-6
        err = np.linalg.norm(np.asarray(drv.get_solution())
                             - np.asarray(s.xref))
        assert abs(err - res.error_norm) < 1e-8
    finally:
        drv.destroy()


def test_block_residual_norms_by_dof_label():
    A, dofmap = multiphysics_block_system(200, ndof=3)
    drv = _drive({
        "linear_system": {},
        "solver": {"gmres": {"relative_tol": 1e-8, "max_iter": 200,
                             "krylov_dim": 50}},
        "preconditioner": "ilu",
    })
    try:
        drv.set_matrix_from_csr(A.indptr, A.indices, A.data)
        drv.system.set_dofmap(dofmap)
        drv.set_rhs(np.ones(A.shape[0]))
        drv.precon_create(); drv.linear_solver_create()
        drv.linear_solver_setup()
        res = drv.linear_solver_apply()
        norms = drv.system.block_residual_norms()
        assert set(norms) == set(np.unique(dofmap).tolist())
        # converged solve → every block residual small, and they
        # compose to the global residual
        total = np.sqrt(sum(v ** 2 for v in norms.values()))
        r = np.asarray(drv.system.b
                       - drv.system.A.matvec(drv.system.x))
        assert np.isclose(total, np.linalg.norm(r), rtol=1e-6)
    finally:
        drv.destroy()


def test_statistics_filename_append(tmp_path):
    out = str(tmp_path / "stats.txt")
    cfg = {
        "general": {"statistics_filename": out},
        "linear_system": {"generate": {"kind": "laplacian_5pt", "nx": 12},
                          "rhs_mode": "ones"},
        "solver": "pcg",
        "preconditioner": "amg",
    }
    for _ in range(2):  # two runs append, not overwrite
        drv = _drive(cfg)
        try:
            drv.linear_system_build()
            drv.precon_create(); drv.linear_solver_create()
            drv.linear_solver_setup(); drv.linear_solver_apply()
            drv.stats_print()
        finally:
            drv.destroy()
    text = open(out).read()
    assert text.count("STATISTICS SUMMARY") == 2


def test_rhs_l2_scaling_preserves_solution():
    """solver.scaling rhs_l2: scaled solve returns the unscaled solution
    (transform applied and undone, ref: scaling.c ScalingTransformSystem)."""
    A = laplacian_2d_5pt(12)
    b = 1e6 * np.ones(A.shape[0])  # large RHS exercises the scaling

    def solve(scaling_on):
        cfg = {
            "linear_system": {},
            "solver": {"pcg": {"relative_tol": 1e-10, "max_iter": 200},
                       "scaling": {"enabled": scaling_on,
                                   "type": "rhs_l2"}},
            "preconditioner": "amg",
        }
        drv = _drive(cfg)
        try:
            drv.set_matrix_from_csr(A.indptr, A.indices, A.data)
            drv.set_rhs(b)
            drv.precon_create(); drv.linear_solver_create()
            drv.linear_solver_setup()
            res = drv.linear_solver_apply()
            assert res.converged
            return np.asarray(drv.get_solution())
        finally:
            drv.destroy()

    x_plain = solve(False)
    x_scaled = solve(True)
    np.testing.assert_allclose(x_scaled, x_plain, rtol=1e-6)
    assert np.linalg.norm(A @ x_scaled - b) / np.linalg.norm(b) < 1e-8
