"""Distributed (8 virtual CPU devices) tests — the reference simulates
multi-node with multi-rank single-node (ref: tests/CMakeLists.txt:159);
we simulate multi-chip with xla_force_host_platform_device_count."""

import numpy as np
import pytest
import scipy.sparse as sp
import jax
import jax.numpy as jnp

from hypredrive_tpu.ops.csr import laplacian_3d_7pt, laplacian_2d_5pt
from hypredrive_tpu.parallel import make_mesh, DistEllMatrix
from hypredrive_tpu.parallel.dist_matrix import pad_vector
from hypredrive_tpu.parallel.halo import build_halo_plan
from hypredrive_tpu.ops.csr import row_partition


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "tests need the 8-device CPU mesh"
    return make_mesh(8)


def test_halo_plan_ring():
    """1-D partition of a tridiagonal matrix needs only ±1 exchanges."""
    import scipy.sparse as sp

    n, p = 64, 8
    A = sp.diags([np.ones(n - 1), 2 * np.ones(n), np.ones(n - 1)],
                 [-1, 0, 1]).tocsr()
    off = row_partition(n, p)
    needed = [np.unique(A[off[s]:off[s + 1]].indices) for s in range(p)]
    plan, recv = build_halo_plan(p, off, needed)
    assert set(plan.offsets) == {1, p - 1}
    # each shard needs exactly 1 value from each side
    for idx in plan.send_idx:
        assert idx.shape == (p, 1)


def test_dist_matvec_matches_host(mesh, rng):
    A = laplacian_3d_7pt(10)
    D = DistEllMatrix.from_csr(A, mesh)
    x = rng.standard_normal(1000)
    xd = pad_vector(x, D.shape[1], mesh)
    y = jax.jit(lambda D, x: D.matvec(x))(D, xd)
    np.testing.assert_allclose(np.asarray(y)[:1000], A @ x, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(D.diagonal())[:1000], A.diagonal())


def test_dist_matvec_padding(mesh, rng):
    """Non-divisible sizes pad with identity rows that stay zero."""
    A = laplacian_3d_7pt(7)  # 343 rows → pad 344
    D = DistEllMatrix.from_csr(A, mesh)
    assert D.shape[0] % 8 == 0
    x = rng.standard_normal(343)
    y = D.matvec(pad_vector(x, D.shape[1], mesh))
    np.testing.assert_allclose(np.asarray(y)[:343], A @ x, rtol=1e-12)
    assert np.abs(np.asarray(y)[343:]).max() == 0.0


def test_dist_rectangular(mesh, rng):
    """P/R-shaped rectangular operators work (grid transfers)."""
    import scipy.sparse as sp

    P_host = sp.random(96, 24, density=0.2, random_state=0, format="csr")
    D = DistEllMatrix.from_csr(P_host, mesh)
    xc = rng.standard_normal(24)
    y = D.matvec(pad_vector(xc, D.shape[1], mesh))
    np.testing.assert_allclose(np.asarray(y)[:96], P_host @ xc, rtol=1e-12,
                               atol=1e-14)


def test_dist_pcg_amg(mesh):
    """Full multi-chip PCG+AMG: converges and matches single-chip counts."""
    from hypredrive_tpu.precon.amg.hierarchy import setup_hierarchy
    from hypredrive_tpu.precon.amg.cycle import amg_apply
    from hypredrive_tpu.solvers.pcg import _pcg_core
    from hypredrive_tpu.config.sections import AMG_SCHEMA

    A = laplacian_3d_7pt(12)
    n = A.shape[0]
    D = DistEllMatrix.from_csr(A, mesh)
    state = setup_hierarchy(A, AMG_SCHEMA.defaults(), mesh=mesh)
    b = pad_vector(np.ones(n), D.shape[0], mesh)
    x0 = pad_vector(np.zeros(n), D.shape[0], mesh)

    @jax.jit
    def solve(D, state, b, x0):
        return _pcg_core(lambda v: D.matvec(v),
                         lambda r: amg_apply(state, r),
                         b, x0, 1e-8, 0.0, 100, True, 0)

    x, iters, norm, done, _ = solve(D, state, b, x0)
    assert bool(done)
    x_np = np.asarray(x)[:n]
    rel = np.linalg.norm(np.ones(n) - A @ x_np) / np.sqrt(n)
    assert rel < 1e-7

    # single-chip reference: iteration counts must agree (same algorithm)
    from hypredrive_tpu.ops.device_matrix import EllMatrix

    E = EllMatrix.from_csr(A)
    s1 = setup_hierarchy(A, AMG_SCHEMA.defaults())
    x1, iters1, *_ = jax.jit(lambda A, s, b, x0: _pcg_core(
        lambda v: A.matvec(v), lambda r: amg_apply(s, r),
        b, x0, 1e-8, 0.0, 100, True, 0))(
            E, s1, jnp.ones(n), jnp.zeros(n))
    assert abs(int(iters) - int(iters1)) <= 1


def test_dist_gmres_jacobi(mesh):
    from hypredrive_tpu.solvers.gmres import _gmres_core

    A = laplacian_2d_5pt(16)  # 256 rows
    n = A.shape[0]
    D = DistEllMatrix.from_csr(A, mesh)
    d = D.diagonal()
    d_inv = jnp.where(d != 0, 1.0 / d, 1.0)
    b = pad_vector(np.ones(n), D.shape[0], mesh)
    x0 = pad_vector(np.zeros(n), D.shape[0], mesh)

    @jax.jit
    def solve(D, d_inv, b, x0):
        return _gmres_core(lambda v: D.matvec(v), lambda r: d_inv * r,
                           b, x0, 1e-8, 0.0, 200, 30, False)

    x, iters, norm, done, _ = solve(D, d_inv, b, x0)
    assert bool(done)
    rel = np.linalg.norm(np.ones(n) - A @ np.asarray(x)[:n]) / np.sqrt(n)
    assert rel < 1e-7


def test_graft_entry_dryrun():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert int(out[1]) > 0
    mod.dryrun_multichip(8)


def test_dist_amg_air_matches_single_chip(mesh):
    """Sharded AIR hierarchy (non-symmetric R over the mesh) applies the
    same operator as the single-chip one: identical V-cycle output and
    matching iteration behavior on an advection-dominated system."""
    from hypredrive_tpu.ops.csr import convection_diffusion_2d
    from hypredrive_tpu.precon.amg.hierarchy import setup_hierarchy
    from hypredrive_tpu.precon.amg.cycle import amg_apply
    from hypredrive_tpu.config.sections import AMG_SCHEMA

    A = convection_diffusion_2d(20, eps=1e-3)
    n = A.shape[0]
    a = AMG_SCHEMA.defaults()
    a.interpolation.restriction_type = 2      # air_2
    a.relaxation.points = 1
    a.relaxation.down_type = 0
    a.relaxation.up_type = 0
    a.relaxation.down_sweeps = 0
    a.relaxation.up_sweeps = 3

    state1 = setup_hierarchy(A, a)
    stateN = setup_hierarchy(A, a, mesh=mesh)

    r = np.random.default_rng(3).standard_normal(n)
    z1 = np.asarray(jax.jit(amg_apply)(state1, jnp.asarray(r)))[:n]
    rd = pad_vector(r, stateN.levels[0].A.shape[0], mesh)
    zN = np.asarray(jax.jit(amg_apply)(stateN, rd))[:n]
    np.testing.assert_allclose(zN, z1, rtol=1e-10, atol=1e-12)


# ---------------------------------------------------------------------------
# distributed hierarchy setup (parallel/dist_setup.py — ref: hypre ParCSR
# BoomerAMGSetup decomposition, SURVEY §2.9)
# ---------------------------------------------------------------------------

def test_dist_setup_bit_identical_cf_and_P(mesh):
    """Per-shard strength/PMIS/ext+i produce bit-identical C/F splits
    and interpolation rows vs the host-global setup, without assembling
    the global matrix."""
    import scipy.sparse as sp
    from hypredrive_tpu.ops.csr import laplacian_3d_7pt
    from hypredrive_tpu.precon.amg.strength import strength_graph
    from hypredrive_tpu.precon.amg.coarsen import pmis, hmis
    from hypredrive_tpu.precon.amg.interp import build_interpolation
    from hypredrive_tpu.parallel import dist_setup as ds

    A = laplacian_3d_7pt(12, dtype=np.float64)
    parts = ds.split_rows(A, 8)
    off = ds.offsets_of(parts)
    S_g = strength_graph(A, theta=0.25)
    S_p = [strength_graph(parts[s], theta=0.25, row_offset=int(off[s]))
           for s in range(8)]
    assert (S_g != sp.csr_matrix(sp.vstack(S_p))).nnz == 0

    cf_g = pmis(S_g, seed=3)
    cf_d = np.concatenate(ds.pmis_dist(S_p, off, seed=3))
    assert np.array_equal(cf_g, cf_d)
    assert np.array_equal(
        hmis(S_g, seed=1), np.concatenate(ds.hmis_dist(S_p, off, seed=1)))

    P_g = build_interpolation(A, S_g, cf_g, prolongation_type=6,
                              trunc_factor=0.0, max_nnz_row=4)
    cf_p = [cf_g[int(off[s]):int(off[s + 1])] for s in range(8)]
    P_parts, c_off = ds.build_P_dist(parts, S_p, off, cf_p, 6, 0.0, 4)
    P_d = sp.csr_matrix(sp.vstack(P_parts))
    assert abs(P_g - P_d).max() < 1e-14

    Ac_g = sp.csr_matrix(P_g.T @ A @ P_g)
    Ac_d = sp.csr_matrix(sp.vstack(ds.rap_dist(parts, P_parts, off, c_off)))
    assert abs(Ac_g - Ac_d).max() < 1e-12


def test_dist_setup_end_to_end_iterations_match(mesh):
    """setup_hierarchy on per-shard parts (mesh) matches the host-global
    hierarchy's PCG iteration count."""
    import scipy.sparse as sp
    from hypredrive_tpu.ops.csr import laplacian_3d_7pt
    from hypredrive_tpu.config.sections import AMG_SCHEMA
    from hypredrive_tpu.parallel import dist_setup as ds
    from hypredrive_tpu.parallel.dist_matrix import DistEllMatrix, pad_vector
    from hypredrive_tpu.precon.amg.hierarchy import setup_hierarchy
    from hypredrive_tpu.precon.amg.cycle import amg_apply
    from hypredrive_tpu.solvers.pcg import _pcg_core

    A = laplacian_3d_7pt(12, dtype=np.float64)
    n = A.shape[0]
    args = AMG_SCHEMA.defaults()
    parts = ds.split_rows(A, 8)
    state_d = setup_hierarchy(parts, args, dtype=jnp.float64, mesh=mesh)
    assert state_d.mesh is mesh

    D0 = state_d.levels[0].A
    b = pad_vector(np.ones(n), D0.shape[0], mesh)
    x0 = pad_vector(np.zeros(n), D0.shape[0], mesh)

    @jax.jit
    def solve(D, s, b, x0):
        return _pcg_core(lambda v: D.matvec(v), lambda r: amg_apply(s, r),
                         b, x0, jnp.asarray(1e-8), jnp.asarray(0.0),
                         100, True, 0)

    it_d = int(solve(D0, state_d, b, x0)[1])

    state_h = setup_hierarchy(A, args, dtype=jnp.float64)
    Ah = state_h.levels[0].A

    @jax.jit
    def solveh(Ah, s, b, x0):
        return _pcg_core(lambda v: Ah.matvec(v), lambda r: amg_apply(s, r),
                         b, x0, jnp.asarray(1e-8), jnp.asarray(0.0),
                         100, True, 0)

    it_h = int(solveh(Ah, state_h, jnp.ones(n), jnp.zeros(n))[1])
    assert abs(it_d - it_h) <= 1
    assert it_d < 20


def test_from_parts_does_not_mutate_caller_blocks(mesh):
    """DistEllMatrix.from_parts must not corrupt the caller's CSR blocks
    (sort_indices on shared data was a real bug)."""
    import scipy.sparse as sp
    from hypredrive_tpu.parallel.dist_matrix import DistEllMatrix
    from hypredrive_tpu.parallel import dist_setup as ds

    rng = np.random.default_rng(0)
    A = sp.csr_matrix(sp.random(64, 64, 0.2, random_state=rng)
                      + 4 * sp.identity(64))
    parts = ds.split_rows(A, 8)
    before = [(p.indices.copy(), p.data.copy()) for p in parts]
    DistEllMatrix.from_parts(parts, mesh, 64, dtype=jnp.float64)
    for p, (idx, dat) in zip(parts, before):
        assert np.array_equal(p.indices, idx)
        assert np.array_equal(p.data, dat)


def _two_field_system(nc=512):
    """Interleaved pressure/saturation CPR-style system + dofmap."""
    import scipy.sparse as sp
    from hypredrive_tpu.ops.csr import laplacian_3d_7pt

    Ap = laplacian_3d_7pt(round(nc ** (1 / 3)))
    nc = Ap.shape[0]
    n = 2 * nc
    coo = Ap.tocoo()
    rows = list(2 * coo.row); cols = list(2 * coo.col); vals = list(coo.data)
    rows += list(2 * np.arange(nc) + 1)
    cols += list(2 * np.arange(nc) + 1); vals += [2.0] * nc
    rows += list(2 * np.arange(nc) + 1)
    cols += list(2 * np.arange(nc)); vals += [0.3] * nc
    rows += list(2 * np.arange(nc))
    cols += list(2 * np.arange(nc) + 1); vals += [0.1] * nc
    A = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
    return A, np.tile([0, 1], nc)


def test_dist_mgr_matches_host_iterations(mesh):
    """GMRES + distributed MGR (sharded F/C split, masked F-relax,
    distributed-AMG coarsest) matches the host MGR iteration count."""
    from hypredrive_tpu.parallel import dist_setup as ds
    from hypredrive_tpu.parallel import dist_precon as dp
    from hypredrive_tpu.parallel.dist_matrix import DistEllMatrix, pad_vector
    from hypredrive_tpu.precon.mgr import mgr_apply, setup_mgr
    from hypredrive_tpu.config.sections import MGR_SCHEMA
    from hypredrive_tpu.ops.device_matrix import EllMatrix
    from hypredrive_tpu.solvers.gmres import _gmres_core

    A, dofmap = _two_field_system()
    n = A.shape[0]
    errors = []
    args = MGR_SCHEMA.parse({"level": {0: {"f_dofs": [1]}},
                             "coarsest_level": "amg"}, "mgr", errors)
    assert not errors
    parts = ds.split_rows(A, 8)
    st = dp.setup_mgr_dist(parts, args, dofmap, mesh, dtype=jnp.float64)
    D = DistEllMatrix.from_csr(A, mesh)
    b = pad_vector(np.ones(n), D.shape[0], mesh)
    x0 = pad_vector(np.zeros(n), D.shape[0], mesh)

    @jax.jit
    def solve(D, st, b, x0):
        return _gmres_core(lambda v: D.matvec(v),
                           lambda r: mgr_apply(st, r),
                           b, x0, jnp.asarray(1e-6), jnp.asarray(0.0),
                           100, 30, False)

    out = solve(D, st, b, x0)
    it_d = int(out[1])
    x = np.asarray(out[0])[:n]
    assert np.linalg.norm(np.ones(n) - A @ x) / np.sqrt(n) < 1e-5

    sth = setup_mgr(A, args, dofmap, dtype=jnp.float64)
    Ah = EllMatrix.from_csr(A, dtype=jnp.float64)

    @jax.jit
    def solveh(Ah, st, b, x0):
        return _gmres_core(lambda v: Ah.matvec(v),
                           lambda r: mgr_apply(st, r),
                           b, x0, jnp.asarray(1e-6), jnp.asarray(0.0),
                           100, 30, False)

    it_h = int(solveh(Ah, sth, jnp.ones(n), jnp.zeros(n))[1])
    assert abs(it_d - it_h) <= 1


def test_dist_bj_ilu_bicgstab(mesh):
    """BiCGSTAB + per-shard block-Jacobi ILU(0) (Jacobi tri-sweeps)
    converges on the mesh."""
    from hypredrive_tpu.parallel import dist_setup as ds
    from hypredrive_tpu.parallel import dist_precon as dp
    from hypredrive_tpu.parallel.dist_matrix import DistEllMatrix, pad_vector
    from hypredrive_tpu.precon.ilu import _tri_jacobi_apply
    from hypredrive_tpu.solvers.bicgstab import _bicgstab_core

    A, _ = _two_field_system()
    n = A.shape[0]
    parts = ds.split_rows(A, 8)
    st = dp.build_bj_ilu_dist(parts, mesh, dtype=jnp.float64)
    D = DistEllMatrix.from_csr(A, mesh)
    b = pad_vector(np.ones(n), D.shape[0], mesh)
    x0 = pad_vector(np.zeros(n), D.shape[0], mesh)

    @jax.jit
    def solve(D, st, b, x0):
        return _bicgstab_core(lambda v: D.matvec(v),
                              lambda r: _tri_jacobi_apply(st, r),
                              b, x0, jnp.asarray(1e-8), jnp.asarray(0.0),
                              200)

    out = solve(D, st, b, x0)
    x = np.asarray(out[0])[:n]
    assert int(out[1]) < 50
    assert np.linalg.norm(np.ones(n) - A @ x) / np.sqrt(n) < 1e-5


def _dist_vs_host_iters(mesh, A, args, dof_func=None, solver="pcg",
                        rtol=1e-8):
    """Helper: iteration counts of the dist-setup vs host-global AMG
    hierarchy on the same system."""
    from hypredrive_tpu.parallel import dist_setup as ds
    from hypredrive_tpu.parallel.dist_matrix import pad_vector
    from hypredrive_tpu.precon.amg.hierarchy import setup_hierarchy
    from hypredrive_tpu.precon.amg.cycle import amg_apply
    from hypredrive_tpu.solvers.pcg import _pcg_core
    from hypredrive_tpu.solvers.gmres import _gmres_core

    n = A.shape[0]
    parts = ds.split_rows(A, 8)
    assert ds.supports_dist_setup(args), "config must be in the subset"
    state_d = setup_hierarchy(parts, args, dtype=jnp.float64, mesh=mesh,
                              dof_func=dof_func)
    assert state_d.mesh is mesh
    D0 = state_d.levels[0].A
    b = pad_vector(np.ones(n), D0.shape[0], mesh)
    x0 = pad_vector(np.zeros(n), D0.shape[0], mesh)

    def core(mv, pc, bb, xx):
        if solver == "gmres":
            return _gmres_core(mv, pc, bb, xx, jnp.asarray(rtol),
                               jnp.asarray(0.0), 100, 30, False)
        return _pcg_core(mv, pc, bb, xx, jnp.asarray(rtol),
                         jnp.asarray(0.0), 100, True, 0)

    @jax.jit
    def solve_d(D, s, bb, xx):
        return core(lambda v: D.matvec(v), lambda r: amg_apply(s, r),
                    bb, xx)

    it_d = int(solve_d(D0, state_d, b, x0)[1])

    state_h = setup_hierarchy(A, args, dtype=jnp.float64,
                              dof_func=dof_func)
    Ah = state_h.levels[0].A

    @jax.jit
    def solve_h(Ah, s, bb, xx):
        return core(lambda v: Ah.matvec(v), lambda r: amg_apply(s, r),
                    bb, xx)

    it_h = int(solve_h(Ah, state_h, jnp.ones(n), jnp.zeros(n))[1])
    return it_d, it_h


def test_dist_setup_num_functions_multiphysics(mesh):
    """Round-5 widening: num_functions > 1 runs the dist path — dof_func
    threads through per-shard strength so cross-function couplings never
    enter S; iterations match host-global (ref: hypre dof_func in
    ParCSR BoomerAMGSetup)."""
    from hypredrive_tpu.ops.csr import multiphysics_block_system
    from hypredrive_tpu.config.sections import AMG_SCHEMA

    A, dofmap = multiphysics_block_system(6, ndof=2)
    args = AMG_SCHEMA.defaults()
    args["coarsening"]["num_functions"] = 2
    it_d, it_h = _dist_vs_host_iters(mesh, sp.csr_matrix(A), args,
                                     dof_func=np.asarray(dofmap),
                                     solver="gmres", rtol=1e-8)
    assert abs(it_d - it_h) <= 1
    assert it_d < 60


def test_dist_setup_aggressive_coarsening(mesh):
    """Aggressive (two-stage) coarsening on the dist path: coarser
    second level than standard PMIS, iteration parity with the
    host-global aggressive setup."""
    from hypredrive_tpu.ops.csr import laplacian_3d_7pt
    from hypredrive_tpu.config.sections import AMG_SCHEMA
    from hypredrive_tpu.parallel import dist_setup as ds
    from hypredrive_tpu.precon.amg.hierarchy import setup_hierarchy

    A = laplacian_3d_7pt(12, dtype=np.float64)
    args = AMG_SCHEMA.defaults()
    args["aggressive"]["num_levels"] = 1
    it_d, it_h = _dist_vs_host_iters(mesh, A, args)
    assert abs(it_d - it_h) <= 2
    assert it_d < 30
    # aggressive really engaged: level-1 size is smaller than the
    # standard-coarsening hierarchy's
    parts = ds.split_rows(A, 8)
    s_agg = setup_hierarchy(parts, args, dtype=jnp.float64, mesh=mesh)
    args0 = AMG_SCHEMA.defaults()
    s_std = setup_hierarchy(parts, args0, dtype=jnp.float64, mesh=mesh)
    assert s_agg.levels[1].A.shape[0] < s_std.levels[1].A.shape[0]


def test_dist_setup_air_restriction(mesh):
    """AIR restriction (lAIR distance-1) + the F/C relax schedule run
    the dist path with iteration parity vs host-global (ref: hypre
    par_restr.c decomposition)."""
    from hypredrive_tpu.ops.csr import convection_diffusion_2d
    from hypredrive_tpu.config.sections import AMG_SCHEMA

    A = sp.csr_matrix(convection_diffusion_2d(16, velocity=(4.0, 2.0)))
    args = AMG_SCHEMA.defaults()
    args["interpolation"]["prolongation_type"] = 100   # one-point (AIR pairing)
    args["interpolation"]["restriction_type"] = 1      # lAIR distance 1
    args["relaxation"]["points"] = 1                   # F/C schedule
    it_d, it_h = _dist_vs_host_iters(mesh, A, args, solver="gmres",
                                     rtol=1e-8)
    assert abs(it_d - it_h) <= 2
    assert it_d < 60


def test_dist_mgr_amg_f_relax(mesh):
    """Round-5: distributed MGR with an AMG F-relax component — the
    full-space embedding (A_ff ⊕ I) runs the component on row-sharded
    operators with zero gather/scatter; iterations match the host MGR
    with the same config (ref: mgr.c:3930-4250 F-relax solvers)."""
    from hypredrive_tpu.parallel import dist_setup as ds
    from hypredrive_tpu.parallel import dist_precon as dp
    from hypredrive_tpu.parallel.dist_matrix import DistEllMatrix, pad_vector
    from hypredrive_tpu.precon.mgr import mgr_apply, setup_mgr
    from hypredrive_tpu.config.sections import MGR_SCHEMA
    from hypredrive_tpu.ops.device_matrix import EllMatrix
    from hypredrive_tpu.solvers.gmres import _gmres_core

    A, dofmap = _two_field_system()
    n = A.shape[0]
    errors = []
    cfg = {"level": {0: {"f_dofs": [1],
                         "f_relaxation": {"amg": {"max_iter": 1}}}},
           "coarsest_level": "amg"}
    args = MGR_SCHEMA.parse(cfg, "mgr", errors)
    assert not errors
    parts = ds.split_rows(A, 8)
    st = dp.setup_mgr_dist(parts, args, dofmap, mesh, dtype=jnp.float64)
    assert st.levels[0].f_kind == "masked-amg"
    D = DistEllMatrix.from_csr(A, mesh)
    b = pad_vector(np.ones(n), D.shape[0], mesh)
    x0 = pad_vector(np.zeros(n), D.shape[0], mesh)

    @jax.jit
    def solve(D, st, b, x0):
        return _gmres_core(lambda v: D.matvec(v),
                           lambda r: mgr_apply(st, r),
                           b, x0, jnp.asarray(1e-6), jnp.asarray(0.0),
                           100, 30, False)

    out = solve(D, st, b, x0)
    it_d = int(out[1])
    x = np.asarray(out[0])[:n]
    assert np.linalg.norm(np.ones(n) - A @ x) / np.sqrt(n) < 1e-5

    sth = setup_mgr(A, args, dofmap, dtype=jnp.float64)
    Ah = EllMatrix.from_csr(A, dtype=jnp.float64)

    @jax.jit
    def solveh(Ah, st, b, x0):
        return _gmres_core(lambda v: Ah.matvec(v),
                           lambda r: mgr_apply(st, r),
                           b, x0, jnp.asarray(1e-6), jnp.asarray(0.0),
                           100, 30, False)

    it_h = int(solveh(Ah, sth, jnp.ones(n), jnp.zeros(n))[1])
    assert abs(it_d - it_h) <= 1


def test_dist_mgr_ilu_f_relax(mesh):
    """Distributed MGR with a bj-ILU(0) F-relax component (full-space
    embedding) converges on the mesh."""
    from hypredrive_tpu.parallel import dist_setup as ds
    from hypredrive_tpu.parallel import dist_precon as dp
    from hypredrive_tpu.parallel.dist_matrix import DistEllMatrix, pad_vector
    from hypredrive_tpu.precon.mgr import mgr_apply
    from hypredrive_tpu.config.sections import MGR_SCHEMA
    from hypredrive_tpu.solvers.gmres import _gmres_core

    A, dofmap = _two_field_system()
    n = A.shape[0]
    errors = []
    cfg = {"level": {0: {"f_dofs": [1],
                         "f_relaxation": {"ilu": {}}}},
           "coarsest_level": "amg"}
    args = MGR_SCHEMA.parse(cfg, "mgr", errors)
    assert not errors
    parts = ds.split_rows(A, 8)
    st = dp.setup_mgr_dist(parts, args, dofmap, mesh, dtype=jnp.float64)
    assert st.levels[0].f_kind == "masked-ilu"
    D = DistEllMatrix.from_csr(A, mesh)
    b = pad_vector(np.ones(n), D.shape[0], mesh)
    x0 = pad_vector(np.zeros(n), D.shape[0], mesh)

    @jax.jit
    def solve(D, st, b, x0):
        return _gmres_core(lambda v: D.matvec(v),
                           lambda r: mgr_apply(st, r),
                           b, x0, jnp.asarray(1e-6), jnp.asarray(0.0),
                           100, 30, False)

    out = solve(D, st, b, x0)
    it_d = int(out[1])
    x = np.asarray(out[0])[:n]
    assert np.linalg.norm(np.ones(n) - A @ x) / np.sqrt(n) < 1e-5
    assert it_d < 40


def test_dist_ams_matches_single_chip(mesh):
    """Round-5: AMS on the mesh — all operators row-sharded
    DistEllMatrix, both auxiliary hierarchies fully distributed;
    iteration parity with the single-chip AMS on the 2-D Maxwell
    system (removes the 'AMS single-chip only' caveat)."""
    from hypredrive_tpu.ops.csr import maxwell_edge_system
    from hypredrive_tpu.precon.ams import build_ams_state, _ams_apply
    from hypredrive_tpu.config.sections import AMS_SCHEMA
    from hypredrive_tpu.parallel.dist_matrix import pad_vector
    from hypredrive_tpu.solvers.pcg import _pcg_core

    A, G, coords = maxwell_edge_system(8, eps=0.1, dim=2)
    n = A.shape[0]
    args = AMS_SCHEMA.defaults()
    b = A @ np.linspace(0.2, 1.0, n)

    st1 = build_ams_state(A, G, coords, args, jnp.float64)
    from hypredrive_tpu.ops.device_matrix import EllMatrix

    A1 = EllMatrix.from_csr(A, dtype=jnp.float64)

    @jax.jit
    def solve1(A1, st, bb, xx):
        return _pcg_core(lambda v: A1.matvec(v),
                         lambda r: _ams_apply(st, r),
                         bb, xx, jnp.asarray(1e-8), jnp.asarray(0.0),
                         200, True, 0)

    it1 = int(solve1(A1, st1, jnp.asarray(b), jnp.zeros(n))[1])

    stN = build_ams_state(A, G, coords, args, jnp.float64, mesh=mesh)
    AN = stN.A
    bN = pad_vector(b, AN.shape[0], mesh)
    xN = pad_vector(np.zeros(n), AN.shape[0], mesh)

    @jax.jit
    def solveN(AN, st, bb, xx):
        return _pcg_core(lambda v: AN.matvec(v),
                         lambda r: _ams_apply(st, r),
                         bb, xx, jnp.asarray(1e-8), jnp.asarray(0.0),
                         200, True, 0)

    outN = solveN(AN, stN, bN, xN)
    itN = int(outN[1])
    x = np.asarray(outN[0])[:n]
    assert np.linalg.norm(b - A @ x) / np.linalg.norm(b) < 1e-6
    assert abs(itN - it1) <= 1


def test_dist_ads_matches_single_chip(mesh):
    """ADS on the mesh: nested distributed AMS on the curl space +
    distributed Π_RT hierarchy; iteration parity with single-chip ADS
    on the grad-div system."""
    from hypredrive_tpu.ops.csr import graddiv_face_system
    from hypredrive_tpu.precon.ads import build_ads_state, _ads_apply
    from hypredrive_tpu.precon.ams import _ams_apply
    from hypredrive_tpu.config.sections import ADS_SCHEMA
    from hypredrive_tpu.parallel.dist_matrix import pad_vector
    from hypredrive_tpu.ops.device_matrix import EllMatrix
    from hypredrive_tpu.solvers.pcg import _pcg_core

    A, C, G, coords = graddiv_face_system(4, eps=0.1)
    n = A.shape[0]
    args = ADS_SCHEMA.defaults()
    b = A @ np.linspace(0.2, 1.0, n)

    st1 = build_ads_state(A, C, G, coords, args, jnp.float64)
    A1 = EllMatrix.from_csr(A, dtype=jnp.float64)

    @jax.jit
    def solve1(A1, st, bb, xx):
        return _pcg_core(lambda v: A1.matvec(v),
                         lambda r: _ads_apply(st, r),
                         bb, xx, jnp.asarray(1e-8), jnp.asarray(0.0),
                         300, True, 0)

    it1 = int(solve1(A1, st1, jnp.asarray(b), jnp.zeros(n))[1])

    stN = build_ads_state(A, C, G, coords, args, jnp.float64, mesh=mesh)
    AN = stN.A
    bN = pad_vector(b, AN.shape[0], mesh)
    xN = pad_vector(np.zeros(n), AN.shape[0], mesh)

    @jax.jit
    def solveN(AN, st, bb, xx):
        return _pcg_core(lambda v: AN.matvec(v),
                         lambda r: _ads_apply(st, r),
                         bb, xx, jnp.asarray(1e-8), jnp.asarray(0.0),
                         300, True, 0)

    outN = solveN(AN, stN, bN, xN)
    itN = int(outN[1])
    x = np.asarray(outN[0])[:n]
    assert np.linalg.norm(b - A @ x) / np.linalg.norm(b) < 1e-6
    assert abs(itN - it1) <= 1
