"""AMG tests: components + golden iteration-count contracts.

The checkable contract mirrors the reference's golden outputs
(ref: examples/refOutput — iteration counts and residual norms, never
times): ex1-class PCG+AMG on ps3d10pt7 must converge in ≤ 7 iterations
(reference: 6 with hybrid-GS smoothing, ex1.txt).
"""

import numpy as np
import pytest

import hypredrive_tpu as hd
from hypredrive_tpu.ops.csr import laplacian_3d_7pt, laplacian_2d_5pt
from hypredrive_tpu.precon.amg.strength import strength_graph
from hypredrive_tpu.precon.amg.coarsen import pmis, hmis
from hypredrive_tpu.precon.amg.interp import (
    direct_interpolation,
    extended_i_interpolation,
)


@pytest.fixture(scope="module")
def poisson():
    A = laplacian_3d_7pt(10)
    S = strength_graph(A, 0.25)
    cf = pmis(S)
    return A, S, cf


def test_strength_graph(poisson):
    A, S, cf = poisson
    assert S.shape == A.shape
    # 7-pt Laplacian: all off-diagonals equal → all strong
    assert S.nnz == A.nnz - A.shape[0]


def test_pmis_is_independent_set(poisson):
    A, S, cf = poisson
    assert set(np.unique(cf)) <= {-1, 1}
    C = np.flatnonzero(cf > 0)
    # C-points form an independent set in the strength graph
    Ssym = ((S + S.T) > 0).tocsr()
    sub = Ssym[C][:, C]
    assert sub.nnz == 0
    # every F point strongly depends on at least one C point (7-pt grid)
    F = np.flatnonzero(cf < 0)
    S_FC = S[F][:, C]
    assert (np.diff(S_FC.indptr) > 0).all()


def test_pmis_deterministic(poisson):
    A, S, cf = poisson
    cf2 = pmis(S)
    assert np.array_equal(cf, cf2)


def test_hmis_coarser_or_equal(poisson):
    A, S, cf = poisson
    cf_h = hmis(S)
    # HMIS should produce a comparable or coarser grid
    assert (cf_h > 0).sum() <= (cf > 0).sum() * 1.3


def test_interp_row_sums(poisson):
    """Interior (zero-row-sum) F rows must interpolate constants exactly."""
    A, S, cf = poisson
    interior = np.abs(A @ np.ones(A.shape[0])) < 1e-12
    for P in (direct_interpolation(A, S, cf),
              extended_i_interpolation(A, S, cf)):
        rs = P @ np.ones(P.shape[1])
        m = interior & (cf < 0)
        np.testing.assert_allclose(rs[m], 1.0, atol=1e-12)
        # C rows are identity
        C = np.flatnonzero(cf > 0)
        np.testing.assert_allclose(rs[C], 1.0, atol=1e-14)


def test_interp_max_nnz_row(poisson):
    A, S, cf = poisson
    P = extended_i_interpolation(A, S, cf, max_nnz_row=2)
    assert np.diff(P.indptr).max() <= 2


def _amg_solve(nx, precon_extra=None, solver="pcg", tol=1e-6):
    cfg = {
        "general": {},
        "linear_system": {
            "generate": {"kind": "laplacian_7pt", "nx": nx},
            "rhs_mode": "ones",
        },
        "solver": {solver: {"relative_tol": tol, "max_iter": 100}},
        "preconditioner": {"amg": precon_extra or {}},
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
        true_rel = np.linalg.norm(r) / np.sqrt(s.num_rows)
        return res, true_rel
    finally:
        drv.destroy()


def test_ex1_iteration_parity():
    """ex1 contract: PCG+AMG on ps3d10pt7 — reference 6 iters @ 4.98e-08
    (examples/refOutput/ex1.txt); allow ≤ 7 with our components."""
    res, true_rel = _amg_solve(10)
    assert res.converged
    assert res.iters <= 7
    assert true_rel < 1e-6


def test_amg_grid_independence():
    """Iteration counts must stay nearly flat with problem size."""
    iters = []
    for nx in (10, 20, 30):
        res, _ = _amg_solve(nx)
        assert res.converged
        iters.append(res.iters)
    assert iters[-1] <= iters[0] + 3


def test_amg_l1_jacobi_smoother():
    res, true_rel = _amg_solve(10, {"relaxation": {"down_type": "l1-jacobi",
                                                   "up_type": "l1-jacobi"}})
    assert res.converged and res.iters <= 12


def test_amg_hmis_coarsening():
    res, _ = _amg_solve(10, {"coarsening": {"type": "hmis",
                                            "strong_th": 0.25}})
    assert res.converged and res.iters <= 10


def test_amg_direct_interp():
    res, _ = _amg_solve(10, {"interpolation":
                             {"prolongation_type": "direct_sep_weights"}})
    assert res.converged and res.iters <= 12


def test_amg_gmres():
    res, true_rel = _amg_solve(10, solver="gmres")
    assert res.converged and res.iters <= 8


def test_amg_2d():
    cfg = {
        "general": {},
        "linear_system": {
            "generate": {"kind": "laplacian_5pt", "nx": 32},
            "rhs_mode": "ones",
        },
        "solver": {"pcg": {"relative_tol": 1e-8, "max_iter": 100}},
        "preconditioner": "amg",
    }
    drv = hd.HypreDrive()
    try:
        drv.input_args_from_dict(cfg)
        drv.linear_system_build()
        drv.precon_create()
        drv.linear_solver_create()
        drv.linear_solver_setup()
        res = drv.linear_solver_apply()
        assert res.converged and res.iters <= 12
    finally:
        drv.destroy()


def test_amg_w_cycle():
    from hypredrive_tpu.precon.amg.hierarchy import setup_hierarchy
    from hypredrive_tpu.precon.amg.cycle import amg_apply
    from hypredrive_tpu.config.sections import AMG_SCHEMA
    import jax.numpy as jnp
    import dataclasses

    A = laplacian_3d_7pt(8)
    state = setup_hierarchy(A, AMG_SCHEMA.defaults())
    state_w = dataclasses.replace(state, cycle_type=1)
    r = jnp.asarray(np.random.default_rng(1).standard_normal(A.shape[0]))
    zv = amg_apply(state, r)
    zw = amg_apply(state_w, r)
    # W-cycle is a better A⁻¹ approximation on the residual
    def err(z):
        return float(np.linalg.norm(A @ np.asarray(z) - np.asarray(r)))
    assert err(zw) <= err(zv) * 1.05
