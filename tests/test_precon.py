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


def test_ilu_gmres_schur_variant():
    """gmres-iluk: two-level Schur-complement ILU with inner GMRES on the
    interface system (ref: ilu.c:42-57 types 10/11).  Must beat plain
    bj-iluk in iterations on a nonsymmetric system."""
    import numpy as np
    import jax.numpy as jnp
    from hypredrive_tpu.ops.csr import convection_diffusion_2d
    from hypredrive_tpu.precon.ilu import (build_ilu_state, _ilu_apply,
                                           SchurILUState)
    from hypredrive_tpu.solvers.gmres import _gmres_core
    from hypredrive_tpu.ops.device_matrix import EllMatrix

    A = convection_diffusion_2d(40, eps=0.01)
    n = A.shape[0]
    E = EllMatrix.from_csr(A, dtype=jnp.float64)
    b = jnp.ones(n, jnp.float64)

    def run(itype):
        st = build_ilu_state(A, {"type": itype, "schur_max_iter": 10}, jnp.float64)
        pc = lambda v: _ilu_apply(st, v)
        mv = lambda v: E.matvec(v)
        x, iters, *_ = _gmres_core(mv, pc, b, jnp.zeros_like(b),
                                   jnp.asarray(1e-8), jnp.asarray(0.0),
                                   200, 50, True)
        r = np.ones(n) - A @ np.asarray(x)
        return int(iters), np.linalg.norm(r) / np.linalg.norm(np.ones(n)), st

    it_bj, rel_bj, _ = run(0)           # bj-ilu0
    it_sch, rel_sch, st = run(10)       # gmres-iluk
    assert isinstance(st, SchurILUState)
    # left-preconditioned GMRES: convergence is in the M-norm, so the
    # true-residual floors differ between preconditioners — assert the
    # solve is accurate and the Schur variant needs FEWER iterations
    assert rel_sch < 1e-4
    assert it_sch < it_bj


def test_ilu_ras_variant_maps_to_schwarz():
    import numpy as np
    import jax.numpy as jnp
    from hypredrive_tpu.ops.csr import laplacian_2d_5pt
    from hypredrive_tpu.precon.ilu import build_ilu_state, _ilu_apply

    A = laplacian_2d_5pt(20)
    st = build_ilu_state(A, {"type": 30}, jnp.float64)
    z = np.asarray(_ilu_apply(st, jnp.ones(A.shape[0], jnp.float64)))
    assert np.all(np.isfinite(z)) and np.abs(z).max() > 0


def test_nsh_ilu_real_not_aliased():
    """nsh-iluk is a real Newton-Schulz-Hotelling approximate inverse
    (ref: ilu.c:42-57): apply is a single SpMV with M ≈ A⁻¹, and on a
    nonsymmetric convection-dominated system it converges in no more
    iterations than bj-iluk with Jacobi-iterated triangular solves."""
    import numpy as np
    import scipy.sparse as sp
    import jax.numpy as jnp
    from hypredrive_tpu.precon.ilu import (build_ilu_state, build_nsh_state,
                                           NSHState, _ilu_apply)
    from hypredrive_tpu.solvers.gmres import _gmres_core

    # 1-D convection-diffusion, strongly nonsymmetric
    n = 400
    h = 1.0 / (n + 1)
    pe = 40.0
    main = 2.0 / h**2 * np.ones(n)
    lo = (-1.0 / h**2 - pe / (2 * h)) * np.ones(n - 1)
    up = (-1.0 / h**2 + pe / (2 * h)) * np.ones(n - 1)
    A = sp.csr_matrix(sp.diags([lo, main, up], [-1, 0, 1]))

    nsh = build_ilu_state(A, {"type": 20, "nsh_droptol": 1e-3},
                          jnp.float64)
    assert isinstance(nsh, NSHState)
    # the approximate inverse really approximates A^{-1}
    res = sp.linalg.norm(sp.identity(n) - A @ nsh.M.to_csr()) / np.sqrt(n)
    assert res < 0.1

    bj = build_ilu_state(A, {"type": 0}, jnp.float64)

    from hypredrive_tpu.ops.device_matrix import EllMatrix

    Ad = EllMatrix.from_csr(A, dtype=jnp.float64)
    b = jnp.ones(n, jnp.float64)

    def iters_with(state):
        out = _gmres_core(lambda v: Ad.matvec(v),
                          lambda r: _ilu_apply(state, r),
                          b, jnp.zeros_like(b),
                          jnp.asarray(1e-8, jnp.float64),
                          jnp.asarray(0.0, jnp.float64), 200, 50, True)
        return int(out[1])

    it_nsh = iters_with(nsh)
    it_bj = iters_with(bj)
    assert it_nsh <= it_bj, (it_nsh, it_bj)
    assert it_nsh < 60


def test_ilu_rcm_reordering_is_real():
    """ilu.reordering: 1 applies RCM before factoring; the similarity-
    permuted factors still solve and the factorization differs from the
    unreordered one (no validated no-op; ref: include/internal/
    ilu.h:19-34 reordering)."""
    import scipy.sparse as sp

    from hypredrive_tpu.precon.ilu import _factor_to_state

    rng = np.random.default_rng(5)
    # scrambled banded SPD matrix: natural order is bad, RCM recovers it
    n = 120
    band = sp.diags([np.full(n - 1, -1.0), np.full(n, 4.0),
                     np.full(n - 1, -1.0)], [-1, 0, 1]).tocsr()
    perm = rng.permutation(n)
    Q = sp.csr_matrix((np.ones(n), (perm, np.arange(n))), shape=(n, n))
    A = sp.csr_matrix(Q @ band @ Q.T)

    from hypredrive_tpu.precon.ilu import _tri_jacobi_apply
    from hypredrive_tpu.config.sections import ILU_SCHEMA

    r = rng.standard_normal(n)
    outs = {}
    for reorder in (0, 1):
        args = ILU_SCHEMA.defaults()
        args["reordering"] = reorder
        args["tri_solve"] = True
        st = _factor_to_state(A, args, jnp.float64)
        z = np.asarray(_tri_jacobi_apply(st, jnp.asarray(r)))
        outs[reorder] = np.linalg.norm(A @ z - r) / np.linalg.norm(r)
    # in RCM order the scrambled band is tridiagonal → ILU(0) is exact
    # (up to the Jacobi tri-solve sweeps); natural-order ILU(0) on the
    # scrambled pattern is not
    assert outs[1] < 1e-5
    assert outs[0] > 100 * max(outs[1], 1e-14)
    # unsupported values are rejected, not accepted as no-ops
    from hypredrive_tpu.core.errors import HypredrvError

    args = ILU_SCHEMA.defaults()
    args["reordering"] = 7
    with pytest.raises(HypredrvError, match="reordering"):
        _factor_to_state(A, args, jnp.float64)


def test_schwarz_local_solver_types_differ():
    """schwarz.local_solver_type iluk/ilut use approximate local
    factors — a genuinely different (weaker) local solve than spdirect
    (ref: include/internal/schwarz.h:18-34)."""
    res_sd, rel_sd = _solve({"schwarz": {"variant": "ras-spdirect",
                                         "overlap": 1}}, solver="gmres")
    res_k, rel_k = _solve({"schwarz": {"variant": "ras-iluk",
                                       "overlap": 1}}, solver="gmres")
    res_t, rel_t = _solve({"schwarz": {"variant": "ras-ilut",
                                       "ilut_droptol": 0.2,
                                       "overlap": 1}}, solver="gmres")
    assert res_sd.converged and res_k.converged and res_t.converged
    assert rel_sd < 1e-7 and rel_k < 1e-7 and rel_t < 1e-7
    # exact local inverses are at least as strong as ILU(0) locals,
    # and an aggressive droptol ILUT is strictly weaker than spdirect
    assert res_sd.iters <= res_k.iters
    assert res_sd.iters < res_t.iters


def test_amg_relax_order_cf_is_real():
    """relaxation.order: 1 runs CF-ordered pointwise relaxation — the
    smoother kind changes and the iteration trajectory differs from
    lexicographic order (ref: amg.c:895 BoomerAMGSetRelaxOrder)."""
    from hypredrive_tpu.precon.amg.hierarchy import setup_hierarchy
    from hypredrive_tpu.config.sections import AMG_SCHEMA
    import jax.numpy as jnp

    A = laplacian_3d_7pt(8)
    args0 = AMG_SCHEMA.defaults()
    args0["relaxation"]["down_type"] = 18      # l1-jacobi
    args0["relaxation"]["up_type"] = 18
    s0 = setup_hierarchy(A, args0, dtype=jnp.float64)
    args1 = AMG_SCHEMA.defaults()
    args1["relaxation"]["down_type"] = 18
    args1["relaxation"]["up_type"] = 18
    args1["relaxation"]["order"] = 1
    s1 = setup_hierarchy(A, args1, dtype=jnp.float64)
    assert s0.levels[0].smoother == "l1-jacobi"
    assert s1.levels[0].smoother == "cf-l1-jacobi"

    from hypredrive_tpu.precon.amg.cycle import amg_apply

    r = jnp.asarray(np.random.default_rng(0).standard_normal(A.shape[0]))
    z0 = np.asarray(amg_apply(s0, r))
    z1 = np.asarray(amg_apply(s1, r))
    # both contract the error, but along different trajectories
    assert not np.allclose(z0, z1)
    x = np.linalg.solve(A.toarray(), np.asarray(r))
    assert np.linalg.norm(z1 - x) < np.linalg.norm(np.asarray(r))
