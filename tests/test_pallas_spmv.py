"""Windowed gather-SpMV: plan construction + kernel correctness.

The Pallas kernel itself runs in interpret mode here (CPU backend);
on TPU the same code path compiles through Mosaic.  The XLA fallback
(segment-sum) must agree bit-for-bit in structure with the plan.
"""

import numpy as np
import pytest
import scipy.sparse as sp
import jax.numpy as jnp

from hypredrive_tpu.ops.gather_plan import build_plan, plan_stats, TILE_ROWS
from hypredrive_tpu.ops.pallas_spmv import GatherSpMV


def _coo(m, n, density, seed=0):
    A = sp.random(m, n, density=density, random_state=seed, format="coo")
    A.data[:] = np.random.default_rng(seed).standard_normal(len(A.data))
    return A


@pytest.mark.parametrize("m,n,density", [
    (2000, 2000, 0.005), (900, 500, 0.02), (500, 900, 0.02),
    (1024, 1024, 0.01), (17, 23, 0.3),
])
def test_xla_fallback_matches_scipy(m, n, density):
    A = _coo(m, n, density)
    plan = build_plan(A.row, A.col, A.data, m, n)
    op = GatherSpMV(plan, dtype=jnp.float64, force_xla=True)
    x = np.random.default_rng(1).standard_normal(n)
    y = np.asarray(op(jnp.asarray(x)))
    assert np.allclose(y, A @ x, atol=1e-12)


def test_interpret_kernel_matches_scipy():
    A = _coo(1500, 1500, 0.01, seed=3)
    plan = build_plan(A.row, A.col, A.data, 1500, 1500)
    op = GatherSpMV(plan, dtype=jnp.float32, interpret=True)
    assert op.use_pallas
    x = np.random.default_rng(2).standard_normal(1500)
    y = np.asarray(op(jnp.asarray(x, jnp.float32)))
    ref = A @ x
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5


def test_plan_pass_invariants():
    A = _coo(5000, 5000, 0.003, seed=5)
    plan = build_plan(A.row, A.col, A.data, 5000, 5000)
    # passes sorted by tile (required for VMEM accumulation)
    assert np.all(np.diff(plan.pass_tile) >= 0)
    # first flags mark tile changes
    expect_first = np.ones_like(plan.pass_first)
    expect_first[1:] = plan.pass_tile[1:] != plan.pass_tile[:-1]
    assert np.array_equal(plan.pass_first, expect_first)
    # every entry present exactly once
    nnz_in_plan = int((plan.val != 0).sum())
    assert nnz_in_plan == len(A.data[A.data != 0])
    # indices in range: lanes within a sublane, q0 within the x operand
    assert plan.lane.min() >= 0 and plan.lane.max() < 128
    assert plan.q0.min() >= 0 and plan.q0.max() < plan.x_sublanes
    npass, fill = plan_stats(plan)
    assert npass == plan.num_passes


def test_structural_helpers():
    A = _coo(1200, 1200, 0.01, seed=7).tocsr()
    A = (A + sp.identity(1200)).tocoo()
    plan = build_plan(A.row, A.col, A.data, 1200, 1200)
    op = GatherSpMV(plan, dtype=jnp.float64, force_xla=True)
    d = np.asarray(op.diagonal_contrib())
    assert np.allclose(d, A.tocsr().diagonal(), atol=1e-12)
    l1 = np.asarray(op.l1_contrib())
    assert np.allclose(l1, np.abs(A.tocsr()).sum(axis=1).A1, atol=1e-12)
    sl = np.random.default_rng(0).uniform(0.5, 2.0, 1200)
    sr = np.random.default_rng(1).uniform(0.5, 2.0, 1200)
    op2 = op.scaled(jnp.asarray(sl), jnp.asarray(sr))
    x = np.random.default_rng(2).standard_normal(1200)
    y = np.asarray(op2(jnp.asarray(x)))
    ref = (sp.diags(sl) @ A @ sp.diags(sr)) @ x
    assert np.allclose(y, ref, atol=1e-10)


def test_ellmatrix_auto_layout_round_trip():
    from hypredrive_tpu.ops.device_matrix import EllMatrix

    A = _coo(3000, 3000, 0.004, seed=11).tocsr()
    A = (A + sp.diags(np.full(3000, 4.0))).tocsr()
    E = EllMatrix.from_csr(A, dtype=jnp.float64)
    x = np.random.default_rng(4).standard_normal(3000)
    assert np.allclose(np.asarray(E.matvec(jnp.asarray(x))), A @ x,
                       atol=1e-10)
    assert np.allclose(np.asarray(E.diagonal()), A.diagonal(), atol=1e-12)
    back = E.to_csr()
    assert np.allclose(back.toarray(), A.toarray(), atol=1e-12)


def test_empty_output_tiles_are_zeroed():
    """Every output tile gets an explicit zeroing pass — a tile with no
    gather entries must return zeros, not uninitialized memory
    (regression: latent garbage in tiles skipped by the planner)."""
    import jax.numpy as jnp
    from hypredrive_tpu.ops.gather_plan import build_plan
    from hypredrive_tpu.ops.pallas_spmv import GatherSpMV

    n = 3072  # 3 output tiles; entries only in tiles 0 and 2
    rows = np.array([5, 17, 2500])
    cols = np.array([100, 900, 40])
    vals = np.array([1.0, 2.0, 3.0])
    plan = build_plan(rows, cols, vals, n, n)
    assert set(plan.pass_tile) == {0, 1, 2}
    g = GatherSpMV(plan, dtype=jnp.float64, interpret=True)
    y = np.asarray(g(jnp.ones(n)))
    expect = np.zeros(n)
    expect[[5, 17, 2500]] = [1.0, 2.0, 3.0]
    np.testing.assert_array_equal(y, expect)


def test_pad_plan_noop_passes():
    """pad_plan appends no-op passes repeating the last tile; results
    are bit-identical (shape-stability device for sequences)."""
    import jax.numpy as jnp
    from hypredrive_tpu.ops.gather_plan import build_plan, pad_plan
    from hypredrive_tpu.ops.pallas_spmv import GatherSpMV

    rng = np.random.default_rng(5)
    n = 4096
    nnz = 600
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.standard_normal(nnz)
    plan = build_plan(rows, cols, vals, n, n)
    plan_p = pad_plan(plan, plan.num_passes + 13)
    # padding is rounded up to whole kernel groups
    assert plan_p.num_passes >= plan.num_passes + 13
    assert plan_p.num_passes % plan.group == 0
    assert (plan_p.pass_first[plan.num_passes:] == 0).all()
    assert (plan_p.pass_tile[plan.num_passes:]
            == plan.pass_tile[-1]).all()
    x = jnp.asarray(rng.standard_normal(n))
    y1 = np.asarray(GatherSpMV(plan, dtype=jnp.float64, interpret=True)(x))
    y2 = np.asarray(GatherSpMV(plan_p, dtype=jnp.float64, interpret=True)(x))
    np.testing.assert_array_equal(y1, y2)


def test_group_invariants():
    """Every tile's pass count is a multiple of the kernel group size."""
    A = _coo(9000, 9000, 0.004, seed=13)
    plan = build_plan(A.row, A.col, A.data, 9000, 9000)
    counts = np.bincount(plan.pass_tile, minlength=plan.n_row_tiles)
    assert plan.group >= 1
    assert (counts % plan.group == 0).all()
    op = GatherSpMV(plan, dtype=jnp.float64, force_xla=True)
    x = np.random.default_rng(3).standard_normal(9000)
    assert np.allclose(np.asarray(op(jnp.asarray(x))), A @ x, atol=1e-10)


def test_chunked_plan_matches(monkeypatch):
    """Plans beyond the SMEM pass budget split into multiple pallas
    calls at tile boundaries; results match the unchunked XLA path."""
    import hypredrive_tpu.ops.pallas_spmv as ps

    A = _coo(6000, 6000, 0.01, seed=17)
    plan = build_plan(A.row, A.col, A.data, 6000, 6000)
    monkeypatch.setattr(ps, "CHUNK_PASSES",
                        max(plan.group * 2, plan.num_passes // 3))
    op = ps.GatherSpMV(plan, dtype=jnp.float32, interpret=True)
    assert op.use_pallas and len(op.chunks) >= 2
    x = np.random.default_rng(5).standard_normal(6000).astype(np.float32)
    y = np.asarray(op(jnp.asarray(x)))
    ref = A @ x
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5
    d = np.asarray(op.diagonal_contrib())
    assert np.allclose(d, A.tocsr().diagonal(), atol=1e-6)


def test_double_single_kernel_interpret_accuracy():
    """The double-single (split-f32) gather kernel reaches ~f64 accuracy
    (compensated Dekker/TwoSum arithmetic) — run in interpret mode on
    CPU; on a real TPU the same kernel serves f64 parity runs where
    Mosaic has no 64-bit (verdict #9 / ROADMAP #4)."""
    import numpy as np
    import scipy.sparse as sp
    import jax.numpy as jnp
    from hypredrive_tpu.ops.gather_plan import build_plan
    from hypredrive_tpu.ops.pallas_spmv import GatherSpMV

    rng = np.random.default_rng(3)
    n = 3000
    A = sp.random(n, n, density=0.003, random_state=rng, format="csr")
    # wide dynamic range so f32 visibly loses digits
    A.data = A.data * np.exp(rng.uniform(-6, 6, A.nnz))
    A = sp.csr_matrix(A + sp.identity(n))
    A.sum_duplicates()
    A.sort_indices()
    coo = A.tocoo()
    x = rng.standard_normal(n) * np.exp(rng.uniform(-3, 3, n))
    y_ref = A @ x

    plan64 = build_plan(coo.row.astype(np.int64), coo.col.astype(np.int64),
                        coo.data.astype(np.float64), n, n)
    g = GatherSpMV(plan64, dtype=jnp.float64, interpret=True, force_ds=True)
    assert g.ds
    y = np.asarray(g(jnp.asarray(x)))
    rel_ds = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)

    plan32 = build_plan(coo.row.astype(np.int64), coo.col.astype(np.int64),
                        coo.data.astype(np.float32), n, n)
    g32 = GatherSpMV(plan32, dtype=jnp.float32, interpret=True)
    y32 = np.asarray(g32(jnp.asarray(x, jnp.float32)))
    rel_f32 = np.linalg.norm(y32 - y_ref) / np.linalg.norm(y_ref)

    assert rel_ds < 1e-13, rel_ds              # f64-class accuracy
    assert rel_ds < rel_f32 * 1e-4             # orders beyond f32


def test_pallas_dia_matvec_matches_xla():
    """The Pallas DIA kernel (interpret mode) is bit-close to the XLA
    shifted-slice formulation on stencil and random-diagonal operators,
    including negative offsets, lane-unaligned shifts, and rectangular
    shapes."""
    import scipy.sparse as sp
    from hypredrive_tpu.ops.pallas_dia import DiaSpMV
    from hypredrive_tpu.ops.csr import laplacian_3d_7pt
    from hypredrive_tpu.ops.device_matrix import from_csr

    rng = np.random.default_rng(3)
    cases = []
    A = laplacian_3d_7pt(12, dtype=np.float32)          # 1728 rows, 7 diags
    cases.append(A)
    n = 1500
    diags = [0, 1, -1, 37, -129, 255, -1000]            # unaligned shifts
    mats = [sp.diags(rng.standard_normal(n - abs(o)), o, shape=(n, n))
            for o in diags]
    cases.append(sp.csr_matrix(sum(mats).tocsr(), dtype=np.float32))
    for A in cases:
        A = sp.csr_matrix(A)
        E = from_csr(A, dtype=jnp.float32, layout="ell")
        assert E.dia_data is not None and len(E.dia_offsets) >= 5
        x = rng.standard_normal(A.shape[1]).astype(np.float32)
        ds = DiaSpMV(E.dia_offsets, A.shape[0], A.shape[1], jnp.float32,
                     interpret=True)
        assert ds.fits
        y_pl = np.asarray(ds(ds.pad_dia(E.dia_data), jnp.asarray(x)))
        # reference: dense product of only the DIA part
        dia_csr = sp.csr_matrix(A.shape, dtype=np.float64)
        dd = np.asarray(E.dia_data, np.float64)
        rows = np.arange(A.shape[0])
        for i, off in enumerate(E.dia_offsets):
            cols = rows + off
            ok = (cols >= 0) & (cols < A.shape[1])
            dia_csr += sp.csr_matrix(
                (dd[i][ok], (rows[ok], cols[ok])), shape=A.shape)
        y_ref = dia_csr @ x.astype(np.float64)
        assert np.allclose(y_pl, y_ref, atol=1e-4 * max(1, np.abs(y_ref).max()))


def test_pallas_dia_windowed_matches_whole():
    """The windowed-x DIA kernel (HBM-resident x, double-buffered halo
    windows — the >1.5M-column mode) matches the whole-x kernel and the
    scipy reference, including negative/positive/unaligned offsets and
    all-positive-offset operands (window base_off path)."""
    import scipy.sparse as sp
    from hypredrive_tpu.ops.pallas_dia import DiaSpMV
    from hypredrive_tpu.ops.device_matrix import from_csr

    rng = np.random.default_rng(5)
    cases = []
    n = 3000
    diags = [0, 1, -1, 137, -129, 255, -1200]
    mats = [sp.diags(rng.standard_normal(n - abs(o)), o, shape=(n, n))
            for o in diags]
    cases.append(sp.csr_matrix(sum(mats).tocsr(), dtype=np.float32))
    # all-positive offsets exercise base_off > 0
    mats = [sp.diags(rng.standard_normal(n - o), o, shape=(n, n))
            for o in (3, 130, 300)]
    cases.append(sp.csr_matrix(sum(mats).tocsr(), dtype=np.float32))
    for A in cases:
        E = from_csr(A, dtype=jnp.float32, layout="ell")
        assert E.dia_data is not None
        x = rng.standard_normal(A.shape[1]).astype(np.float32)
        ds = DiaSpMV(E.dia_offsets, A.shape[0], A.shape[1], jnp.float32,
                     interpret=True)
        ds.windowed = True                 # force the windowed mode
        y_win = np.asarray(ds(ds.pad_dia(E.dia_data), jnp.asarray(x)))
        ds2 = DiaSpMV(E.dia_offsets, A.shape[0], A.shape[1], jnp.float32,
                      interpret=True)
        assert not ds2.windowed
        y_whole = np.asarray(ds2(ds2.pad_dia(E.dia_data), jnp.asarray(x)))
        np.testing.assert_allclose(y_win, y_whole, rtol=1e-5, atol=1e-5)
