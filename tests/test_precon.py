"""ILU / FSAI / scaling / reuse preconditioner tests
(reference analogue: tests/test_precon.c)."""

import numpy as np
import pytest
import jax.numpy as jnp

import hypredrive_tpu as hd
from hypredrive_tpu.ops.csr import laplacian_3d_7pt, multiphysics_block_system
from hypredrive_tpu.precon.ilu import ilu0_factor


def _solve(precon, solver="gmres", tol=1e-8, nx=8, general=None):
    cfg = {
        "general": general or {},
        "linear_system": {
            "generate": {"kind": "laplacian_7pt", "nx": nx},
            "rhs_mode": "ones",
        },
        "solver": {solver: {"relative_tol": tol, "max_iter": 300}},
        "preconditioner": precon,
    }
    drv = hd.HypreDrive()
    try:
        drv.input_args_from_dict(cfg)
        s = drv.linear_system_build()
        drv.precon_create()
        drv.linear_solver_create()
        drv.linear_solver_setup()
        res = drv.linear_solver_apply()
        x = drv.get_solution()
        r = np.ones(s.num_rows) - s.A_host @ x
        return res, np.linalg.norm(r) / np.sqrt(s.num_rows)
    finally:
        drv.destroy()


def test_ilu0_exact_on_pattern():
    A = laplacian_3d_7pt(5)
    L, U = ilu0_factor(A)
    mask = (A.toarray() != 0)
    err = np.abs(((L @ U).toarray() - A.toarray()) * mask).max()
    assert err < 1e-12
    # L unit lower, U upper
    assert np.allclose(L.diagonal(), 1.0)
    assert abs((np.triu(L.toarray(), 1)).max()) == 0
    assert abs((np.tril(U.toarray(), -1)).max()) == 0


def test_ilu_precon_converges():
    res, true_rel = _solve("ilu")
    assert res.converged and true_rel < 1e-7
    # ILU(0) must beat plain Jacobi on iteration count
    res_j, _ = _solve("jacobi")
    assert res.iters < res_j.iters


def test_ilut_precon():
    res, true_rel = _solve({"ilu": {"type": "bj-ilut", "droptol": 1e-4}})
    assert res.converged and true_rel < 1e-7


def test_ilu_jacobi_sweep_option():
    res, true_rel = _solve({"ilu": {"tri_solve": False,
                                    "lower_jac_iters": 8,
                                    "upper_jac_iters": 8}})
    assert res.converged and true_rel < 1e-7


def test_fsai_precon_converges():
    res, true_rel = _solve("fsai", solver="pcg")
    assert res.converged and true_rel < 1e-7
    res_n, _ = _solve("none", solver="pcg")
    assert res.iters < res_n.iters


def test_fsai_spd_preserving():
    """FSAI keeps PCG valid (GᵀG is SPD by construction)."""
    res, true_rel = _solve({"fsai": {"max_nnz_row": 9}}, solver="pcg",
                           tol=1e-10)
    assert res.converged and true_rel < 1e-9


def test_scaling_rhs_l2():
    res, true_rel = _solve_scaled({"enabled": True, "type": "rhs_l2"})
    assert res.converged and true_rel < 1e-7


def test_scaling_dofmap_custom():
    cfg = {
        "general": {},
        "linear_system": {
            "generate": {"kind": "multiphysics", "ncell": 200, "ndof": 3},
            "rhs_mode": "ones",
        },
        "solver": {
            "gmres": {"relative_tol": 1e-8, "max_iter": 300},
            "scaling": {"enabled": True, "type": "dofmap_custom",
                        "custom_values": [1.0, 3.0, 10.0]},
        },
        "preconditioner": "ilu",
    }
    drv = hd.HypreDrive()
    try:
        drv.input_args_from_dict(cfg)
        s = drv.linear_system_build()
        assert s.dofmap is not None
        drv.precon_create()
        drv.linear_solver_create()
        drv.linear_solver_setup()
        res = drv.linear_solver_apply()
        x = drv.get_solution()
        # scaling must be undone: solution solves the ORIGINAL system
        r = np.ones(s.num_rows) - s.A_host @ x
        assert np.linalg.norm(r) / np.sqrt(s.num_rows) < 1e-6
        # original matrix restored
        assert s.scaling is None
    finally:
        drv.destroy()


def _solve_scaled(scaling):
    cfg = {
        "general": {},
        "linear_system": {
            "generate": {"kind": "laplacian_7pt", "nx": 8},
            "rhs_mode": "ones",
        },
        "solver": {"gmres": {"relative_tol": 1e-8, "max_iter": 300},
                   "scaling": scaling},
        "preconditioner": "jacobi",
    }
    drv = hd.HypreDrive()
    try:
        drv.input_args_from_dict(cfg)
        s = drv.linear_system_build()
        drv.precon_create()
        drv.linear_solver_create()
        drv.linear_solver_setup()
        res = drv.linear_solver_apply()
        x = drv.get_solution()
        r = np.ones(s.num_rows) - s.A_host @ x
        return res, np.linalg.norm(r) / np.sqrt(s.num_rows)
    finally:
        drv.destroy()


def test_precon_reuse_static():
    """Reuse engine: precon built once, reused across repetitions."""
    cfg = {
        "general": {"num_repetitions": 3},
        "linear_system": {
            "generate": {"kind": "laplacian_7pt", "nx": 6},
            "rhs_mode": "ones",
        },
        "solver": {"pcg": {"relative_tol": 1e-8}},
        "preconditioner": {"amg": {}, "reuse": {"enabled": True}},
    }
    drv = hd.HypreDrive()
    try:
        drv.input_args_from_dict(cfg)
        drv.linear_system_build()
        ids = []
        for rep in range(3):
            drv.reset_initial_guess()
            drv.precon_create()
            drv.linear_solver_create()
            drv.linear_solver_setup()
            drv.linear_solver_apply()
            ids.append(id(drv.precon))
            drv.precon_destroy()
            drv.linear_solver_destroy()
        assert ids[0] == ids[1] == ids[2]  # same precon object kept
        assert all(e.iters > 0 for e in drv.stats.entries)
    finally:
        drv.destroy()
