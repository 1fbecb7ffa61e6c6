"""Krylov solver tests (reference analogue: tests/test_solver.c +
golden-output iteration/residual contracts)."""

import numpy as np
import pytest
import jax.numpy as jnp

import hypredrive_tpu as hd
from hypredrive_tpu.ops.csr import laplacian_3d_7pt, laplacian_2d_5pt
from hypredrive_tpu.ops.device_matrix import EllMatrix


def _solve(solver, precon, n=10, tol=1e-8, extra_solver=None, extra_general=None):
    cfg = {
        "general": dict(extra_general or {}),
        "linear_system": {
            "generate": {"kind": "laplacian_7pt", "nx": n},
            "rhs_mode": "ones",
        },
        "solver": {solver: dict({"relative_tol": tol, "max_iter": 200},
                                **(extra_solver or {}))},
        "preconditioner": precon,
    }
    drv = hd.HypreDrive()
    try:
        drv.input_args_from_dict(cfg)
        system = drv.linear_system_build()
        drv.precon_create()
        drv.linear_solver_create()
        drv.linear_solver_setup()
        res = drv.linear_solver_apply()
        x = drv.get_solution()
        r = np.ones(system.num_rows) - system.A_host @ x
        true_rel = np.linalg.norm(r) / np.sqrt(system.num_rows)
        return res, true_rel
    finally:
        drv.destroy()


@pytest.mark.parametrize("solver", ["pcg", "gmres", "fgmres", "bicgstab"])
def test_all_solvers_converge_jacobi(solver):
    res, true_rel = _solve(solver, "jacobi", n=8, tol=1e-8)
    assert res.converged
    assert true_rel < 1e-7
    assert 0 < res.iters <= 200


@pytest.mark.parametrize("solver", ["pcg", "gmres", "fgmres", "bicgstab"])
def test_all_solvers_converge_unpreconditioned(solver):
    res, true_rel = _solve(solver, "none", n=6, tol=1e-9)
    assert res.converged
    assert true_rel < 1e-8


def test_gmres_restart():
    res, true_rel = _solve("gmres", "none", n=8, tol=1e-8,
                           extra_solver={"krylov_dim": 5})
    assert res.converged
    assert true_rel < 1e-7
    assert res.iters > 5  # must have restarted


def test_pcg_residual_history():
    res, _ = _solve("pcg", "jacobi", n=8, tol=1e-8)
    hist = res.res_history
    valid = hist[~np.isnan(hist)]
    assert len(valid) >= res.iters
    # monotone-ish decrease overall
    assert valid[-1] < valid[0]


def test_chebyshev_precon():
    res, true_rel = _solve("pcg", {"chebyshev": {"order": 4}}, n=8)
    assert res.converged
    assert true_rel < 1e-7


def test_gauss_seidel_precon():
    res, true_rel = _solve("pcg", "gauss-seidel", n=8)
    assert res.converged


def test_max_iter_reported_as_failure():
    res, _ = _solve("pcg", "none", n=10, tol=1e-14,
                    extra_solver={"max_iter": 3})
    assert res.iters == 3
    assert not res.converged


def test_float32_path():
    res, true_rel = _solve("pcg", "jacobi", n=8, tol=1e-5,
                           extra_general={"dtype": "float32"})
    assert res.converged
    assert true_rel < 1e-4


def test_one_shot_solve_api():
    import scipy.sparse as sp

    A = laplacian_2d_5pt(8)
    b = np.ones(64)
    res = hd.solve(A=A, b=b, options={
        "linear_system": {},
        "solver": {"pcg": {"relative_tol": 1e-10}},
        "preconditioner": "jacobi",
    })
    assert res.converged
    np.testing.assert_allclose(A @ res.x, b, atol=1e-7)
    assert res.solution_norm > 0


def test_solution_matches_direct():
    import scipy.sparse.linalg as spla

    A = laplacian_3d_7pt(6)
    b = np.ones(216)
    res = hd.solve(A=A, b=b, options={
        "linear_system": {},
        "solver": {"gmres": {"relative_tol": 1e-12}},
        "preconditioner": "jacobi",
    })
    x_direct = spla.spsolve(A.tocsc(), b)
    np.testing.assert_allclose(res.x, x_direct, rtol=1e-6, atol=1e-8)


def test_gmres_tagged_reference_error_tracking():
    """With xref + dofmap set, GMRES records per-iteration per-dof-block
    error norms ||x_k − xref|| (ref: hypredrv_GMRESSetRefSolution,
    src/internal/gmres.c:80-103; tags src/HYPREDRV.c:693-726)."""
    import scipy.sparse as sp
    import tempfile, os
    from hypredrive_tpu.ops.csr import multiphysics_block_system
    from hypredrive_tpu.io import ij

    A, dofmap = multiphysics_block_system(8, ndof=2)
    A = sp.csr_matrix(A)
    n = A.shape[0]
    xref = np.linspace(0.5, 1.5, n)
    b = A @ xref
    td = tempfile.mkdtemp()
    ij.write_matrix_ascii(os.path.join(td, "A"), A)
    ij.write_vector_ascii(os.path.join(td, "b"), b)
    ij.write_vector_ascii(os.path.join(td, "xref"), xref)
    ij.write_dofmap_ascii(os.path.join(td, "dof"), dofmap)
    drv = hd.HypreDrive()
    try:
        drv.input_args_from_dict({
            "general": {},
            "linear_system": {
                "matrix_filename": os.path.join(td, "A"),
                "rhs_filename": os.path.join(td, "b"),
                "xref_filename": os.path.join(td, "xref"),
                "dofmap_filename": os.path.join(td, "dof"),
            },
            "solver": {"gmres": {"relative_tol": 1e-10}},
            "preconditioner": "ilu",
        })
        drv.linear_system_build()
        drv.precon_create()
        drv.linear_solver_create()
        drv.linear_solver_setup()
        res = drv.linear_solver_apply()
    finally:
        drv.destroy()
    eh = res.error_histories
    assert eh is not None and eh.shape[1] == 2
    it = res.iters
    valid = eh[:it + 1]
    assert np.all(np.isfinite(valid))
    # error decreases over the iteration and ends tiny per block
    assert valid[-1].max() < 1e-6 * max(1.0, valid[0].max())
    assert valid[0].max() > valid[-1].max()
