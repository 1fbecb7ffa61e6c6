"""MGR + Schwarz + component composition tests
(reference analogues: tests/test_mgr_nested_yaml.c, test_krylov.c)."""

import numpy as np
import pytest

import hypredrive_tpu as hd


def _run(precon_cfg, ncell=400, ndof=3, tol=1e-6, solver="gmres",
         max_iter=150, dof_labels=None):
    ls = {
        "generate": {"kind": "multiphysics", "ncell": ncell, "ndof": ndof},
        "rhs_mode": "ones",
    }
    if dof_labels:
        ls["dof_labels"] = dof_labels
    cfg = {
        "general": {},
        "linear_system": ls,
        "solver": {solver: {"relative_tol": tol, "max_iter": max_iter}},
        "preconditioner": precon_cfg,
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


def test_mgr_two_level_ex3_style():
    """ex3-shaped config: 2 reduction levels + AMG coarse."""
    res, true_rel = _run({"mgr": {
        "level": {
            0: {"f_dofs": [2], "prolongation_type": "jacobi"},
            1: {"f_dofs": [1], "g_relaxation": "l1-hsgs",
                "restriction_type": "columped"},
        },
        "coarsest_level": "amg",
    }})
    assert res.converged
    assert true_rel < 1e-4


def test_mgr_nested_krylov_frelax():
    """f_relaxation: krylov block (ref: ex3-mgr_Frelax_gmres.yml)."""
    res, true_rel = _run({"mgr": {
        "level": {0: {"f_dofs": [2],
                      "f_relaxation": {"krylov": {"type": "gmres",
                                                  "max_iter": 5}}}},
        "coarsest_level": "spdirect",
    }})
    assert res.converged and res.iters <= 20
    assert true_rel < 1e-5


def test_mgr_nested_mgr():
    """f_relaxation: mgr (nested MGR, ref: ex7-nested-mgr.yml)."""
    res, true_rel = _run({"mgr": {
        "level": {0: {
            "f_dofs": [1, 2],
            "f_relaxation": {"mgr": {
                "level": {0: {"f_dofs": [2]}},
                "coarsest_level": "spdirect",
            }},
        }},
        "coarsest_level": "amg",
    }})
    assert res.converged
    assert true_rel < 1e-4


def test_mgr_coarsest_variants():
    for cls in ("spdirect", "ilu", "amg"):
        res, true_rel = _run({"mgr": {
            "level": {0: {"f_dofs": [1, 2],
                          "f_relaxation": "chebyshev"}},
            "coarsest_level": cls,
        }})
        assert res.converged, cls


def test_mgr_dof_label_names():
    """f_dofs by symbolic name through linear_system.dof_labels."""
    res, true_rel = _run({"mgr": {
        "level": {0: {"f_dofs": ["saturation"]}},
        "coarsest_level": "spdirect",
    }}, dof_labels={"pressure": 0, "density": 1, "saturation": 2})
    assert res.converged


def test_mgr_requires_dofmap():
    from hypredrive_tpu.core.errors import HypredrvError

    cfg = {
        "general": {},
        "linear_system": {
            "generate": {"kind": "laplacian_7pt", "nx": 6},  # no dofmap
            "rhs_mode": "ones",
        },
        "solver": "gmres",
        "preconditioner": {"mgr": {"level": {0: {"f_dofs": [0]}},
                                   "coarsest_level": "amg"}},
    }
    drv = hd.HypreDrive()
    try:
        drv.input_args_from_dict(cfg)
        drv.linear_system_build()
        drv.precon_create()
        drv.linear_solver_create()
        with pytest.raises(HypredrvError, match="dofmap"):
            drv.linear_solver_setup()
    finally:
        drv.destroy()


def test_mgr_w_cycle_and_positions():
    res, _ = _run({"mgr": {
        "cycle": "w(1,1)",
        "level": {0: {"f_dofs": [2]}},
        "coarsest_level": "spdirect",
    }})
    assert res.converged


def test_schwarz_ras():
    res, true_rel = _run("schwarz", solver="gmres")
    assert res.converged and true_rel < 1e-4


def test_schwarz_variants():
    res_ras, _ = _run({"schwarz": {"variant": "ras-iluk", "overlap": 1}})
    res_as, _ = _run({"schwarz": {"variant": "as-iluk", "overlap": 1}})
    assert res_ras.converged and res_as.converged


def test_schwarz_on_laplacian():
    cfg = {
        "general": {},
        "linear_system": {
            "generate": {"kind": "laplacian_7pt", "nx": 8},
            "rhs_mode": "ones",
        },
        "solver": {"pcg": {"relative_tol": 1e-8, "max_iter": 200}},
        "preconditioner": {"schwarz": {"variant": "ras-spdirect",
                                       "overlap": 1}},
    }
    drv = hd.HypreDrive()
    try:
        drv.input_args_from_dict(cfg)
        s = drv.linear_system_build()
        drv.precon_create()
        drv.linear_solver_create()
        drv.linear_solver_setup()
        res = drv.linear_solver_apply()
        assert res.converged
        x = drv.get_solution()
        r = np.ones(512) - s.A_host @ x
        assert np.linalg.norm(r) / np.sqrt(512) < 1e-7
    finally:
        drv.destroy()


def test_mgr_air_restriction():
    """restriction_type air_1/air_1.5 build lAIR restrictions on the
    level operator (ref vocab: mgr.c:1671-1680)."""
    for rt in ("air_1", "air_1.5"):
        res, true_rel = _run({"mgr": {
            "level": {0: {"f_dofs": [2], "restriction_type": rt}},
            "coarsest_level": "amg",
        }})
        assert res.converged, rt
        assert true_rel < 1e-4


def test_mgr_blk_jacobi_transfers():
    """blk-jacobi prolongation/restriction use the true block-diagonal
    inverse (bsize = #F labels per cell; ref: mgr.c blk-jacobi)."""
    res, true_rel = _run({"mgr": {
        "level": {0: {"f_dofs": [1, 2],
                      "prolongation_type": "blk-jacobi",
                      "restriction_type": "blk-jacobi"}},
        "coarsest_level": "amg",
    }})
    assert res.converged
    assert true_rel < 1e-4


def test_mgr_block_diag_inv_exact():
    import scipy.sparse as sp
    from hypredrive_tpu.precon.mgr import _block_diag_inv

    rng = np.random.default_rng(3)
    bs, nb = 3, 5
    blocks = rng.standard_normal((nb, bs, bs)) + 4 * np.eye(bs)
    A = sp.block_diag([b for b in blocks], format="csr")
    # add sparse noise; entries OUTSIDE the block diagonal are ignored
    A = sp.csr_matrix(
        A + sp.random(nb * bs, nb * bs, density=0.05, random_state=1))
    dense = A.toarray()
    got = _block_diag_inv(A, bs).toarray()
    for k in range(nb):
        blk = dense[k * bs:(k + 1) * bs, k * bs:(k + 1) * bs]
        np.testing.assert_allclose(
            got[k * bs:(k + 1) * bs, k * bs:(k + 1) * bs],
            np.linalg.inv(blk), rtol=1e-9)
    # and nothing off the block diagonal
    mask = np.ones((nb * bs, nb * bs), bool)
    for k in range(nb):
        mask[k * bs:(k + 1) * bs, k * bs:(k + 1) * bs] = False
    assert np.all(got[mask] == 0)


def test_mgr_schwarz_component():
    """Schwarz as an MGR F-relaxation / global-relaxation component
    (ref: mgr.c:68-365 Schwarz wrappers)."""
    res, true_rel = _run({"mgr": {
        "level": {0: {"f_dofs": [2],
                      "f_relaxation": {"schwarz": {"variant": "ras-iluk",
                                                   "overlap": 1}}}},
        "coarsest_level": "amg",
    }})
    assert res.converged
    assert true_rel < 1e-4


def test_mgr_component_reuse_keeps_cached_solver():
    """A `reuse:` block beside the component method keeps the cached
    component across setups (ref: MGRComponentReuse_args,
    include/internal/mgr.h:43-50)."""
    from hypredrive_tpu.precon.mgr import setup_mgr
    from hypredrive_tpu.ops.csr import multiphysics_block_system

    A, dofmap = multiphysics_block_system(100, 3, seed=7)
    args = {
        "level": {0: {"f_dofs": [2],
                      "f_relaxation": {"amg": {"max_iter": 1},
                                       "reuse": {"enabled": True}}}},
        "coarsest_level": "amg",
    }
    cache = {}
    s0 = setup_mgr(A, args, dofmap, component_cache=cache, setup_index=0)
    assert ("lvl", 0, "f") in cache
    kept_state = cache[("lvl", 0, "f")][1]
    s1 = setup_mgr(A, args, dofmap, component_cache=cache, setup_index=1)
    # identical object ⇒ the F component setup was skipped
    assert s1.levels[0].f_state is kept_state
    # without the reuse block a fresh component is built each time
    args2 = {
        "level": {0: {"f_dofs": [2], "f_relaxation": {"amg": {"max_iter": 1}}}},
        "coarsest_level": "amg",
    }
    cache2 = {}
    s2 = setup_mgr(A, args2, dofmap, component_cache=cache2, setup_index=0)
    s3 = setup_mgr(A, args2, dofmap, component_cache=cache2, setup_index=1)
    assert s3.levels[0].f_state is not s2.levels[0].f_state


def test_mgr_blk_jacobi_nonuniform_labels_degrades_with_warning():
    """A blk-jacobi transfer on a NON-uniform dof-label layout must
    degrade to the diagonal transfer loudly, not silently
    (the reference's blk-jacobi assumes block-ordered unknowns)."""
    import io
    import numpy as np
    import scipy.sparse as sp
    from hypredrive_tpu.core.logging import logger
    from hypredrive_tpu.precon.mgr import setup_mgr

    rng = np.random.default_rng(3)
    n = 90
    A = sp.random(n, n, density=0.05, random_state=rng, format="csr")
    A = sp.csr_matrix(A + A.T + sp.identity(n) * 10.0)
    # non-uniform layout: the F labels (1,1,2 repeating) are NOT
    # periodic with period 2 = #distinct F labels
    dofmap = np.concatenate([np.zeros(n // 3, np.int64),
                             np.tile([1, 1, 2], n // 3)])[:n]
    args = {
        "level": {0: {"f_dofs": [1, 2],
                      "prolongation_type": "blk-jacobi",
                      "restriction_type": "blk-jacobi"}},
        "coarsest_level": "amg",
    }
    buf = io.StringIO()
    old_level, old_stream = logger.level, logger.stream
    logger.level, logger.stream = 2, buf
    try:
        state = setup_mgr(A, args, dofmap)
    finally:
        logger.level, logger.stream = old_level, old_stream
    assert state is not None
    assert "degrades to diagonal" in buf.getvalue()
