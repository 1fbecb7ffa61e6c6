"""Sequence machinery: lsseq container, print_system dumps, warm starts,
adaptive reuse (reference analogues: tests/test_lsseq.c, test_comp.c,
test_linsys_print.c)."""

import os

import numpy as np
import pytest
import scipy.sparse as sp

import hypredrive_tpu as hd
from hypredrive_tpu.ops.csr import laplacian_2d_5pt, multiphysics_block_system
from hypredrive_tpu.io import lsseq, comp
from hypredrive_tpu.io.ij import read_matrix_ascii, read_vector_ascii


@pytest.fixture
def seq_file(tmp_path):
    """3-system sequence sharing one sparsity pattern + 1 odd pattern."""
    A0 = laplacian_2d_5pt(8)
    systems = []
    for k in range(3):
        A = A0.copy()
        A.data = A.data * (1.0 + 0.1 * k)
        systems.append({"A": A, "b": np.full(64, 1.0 + k),
                        "dofmap": np.arange(64) % 2})
    # genuinely different sparsity: add a corner coupling entry
    A_odd = sp.lil_matrix(A0)
    A_odd[0, 63] = 0.5
    A_odd = sp.csr_matrix(A_odd)
    systems.append({"A": A_odd, "b": np.ones(64),
                    "dofmap": np.arange(64) % 2})
    path = str(tmp_path / "seq.lsseq")
    lsseq.write_lsseq(path, systems, codec=comp.COMP_ZLIB,
                      info={"case": "unit-test"},
                      timesteps=[(0, 0), (1, 2)], n_parts=2)
    return path, systems


def test_lsseq_round_trip(seq_file):
    path, systems = seq_file
    f = lsseq.LSSeqFile(path)
    s = f.summary()
    assert s.num_systems == 4
    assert s.num_parts == 2
    # part 0: shared pattern (sys 0-2) + odd corner pattern (sys 3);
    # part 1: one pattern shared by all 4 systems → 3 total
    assert s.num_patterns == 3
    assert s.has_dofmap and s.has_timesteps
    assert f.info["case"] == "unit-test"
    for k in range(4):
        A = f.read_matrix(k)
        assert (abs(A - systems[k]["A"]) > 1e-14).nnz == 0
        np.testing.assert_allclose(f.read_rhs(k), systems[k]["b"])
        np.testing.assert_array_equal(f.read_dofmap(k), systems[k]["dofmap"])
    assert f.read_timesteps() == [(0, 0), (1, 2)]
    # pattern dedup: systems 0-2 share pattern ids
    assert f.pattern_id(0) == f.pattern_id(1) == f.pattern_id(2)
    assert f.pattern_id(3) != f.pattern_id(0)


def test_lsseq_zstd(tmp_path):
    A = laplacian_2d_5pt(4)
    path = str(tmp_path / "z.lsseq")
    lsseq.write_lsseq(path, [{"A": A, "b": np.ones(16)}],
                      codec=comp.COMP_ZSTD)
    f = lsseq.LSSeqFile(path)
    assert (abs(f.read_matrix(0) - A) > 1e-14).nnz == 0


def test_lsseq_corrupt_magic(tmp_path):
    from hypredrive_tpu.core.errors import HypredrvError

    path = str(tmp_path / "bad.lsseq")
    with open(path, "wb") as f:
        f.write(b"\x00" * 200)
    with pytest.raises(HypredrvError, match="magic"):
        lsseq.LSSeqFile(path)


def test_sequence_solve_with_warm_start(seq_file, tmp_path):
    """Full CLI-style sequence: lsseq systems, previous-solution warm
    start, stats entry per system."""
    path, systems = seq_file
    cfg = {
        "general": {},
        "linear_system": {
            "sequence_filename": path,
            "init_guess_mode": "previous",
        },
        "solver": {"gmres": {"relative_tol": 1e-8, "max_iter": 200}},
        "preconditioner": "ilu",
    }
    drv = hd.HypreDrive()
    try:
        drv.input_args_from_dict(cfg)
        iters = []
        for k in range(4):
            drv.linear_system_build()
            drv.reset_initial_guess()
            drv.precon_create()
            drv.linear_solver_create()
            drv.linear_solver_setup()
            res = drv.linear_solver_apply()
            assert res.converged
            iters.append(res.iters)
            x = drv.get_solution()
            r = systems[k]["b"] - systems[k]["A"] @ x
            assert np.linalg.norm(r) / np.linalg.norm(systems[k]["b"]) < 1e-7
            drv.precon_destroy()
            drv.linear_solver_destroy()
        assert len(drv.stats.entries) == 4
        # warm start: system 1 (10% perturbation of system 0) should take
        # fewer iterations than the cold first solve
        assert iters[1] <= iters[0]
    finally:
        drv.destroy()


def test_print_system_dumps(tmp_path):
    outdir = str(tmp_path / "dumps")
    cfg = {
        "general": {},
        "linear_system": {
            "generate": {"kind": "laplacian_5pt", "nx": 6},
            "rhs_mode": "ones",
            "print_system": {
                "enable": True,
                "trigger": "all",
                "stages": ["build", "apply"],
                "artifacts": ["matrix", "rhs", "solution", "metadata"],
                "dirname": outdir,
            },
        },
        "solver": {"pcg": {"relative_tol": 1e-8}},
        "preconditioner": "jacobi",
    }
    drv = hd.HypreDrive()
    try:
        drv.input_args_from_dict(cfg)
        s = drv.linear_system_build()
        drv.precon_create()
        drv.linear_solver_create()
        drv.linear_solver_setup()
        drv.linear_solver_apply()
    finally:
        drv.destroy()

    build_dir = os.path.join(outdir, "ls_00000", "build")
    apply_dir = os.path.join(outdir, "ls_00000", "apply")
    assert os.path.exists(os.path.join(build_dir, "IJ.out.A"))
    assert os.path.exists(os.path.join(build_dir, "metadata.yml"))
    assert os.path.exists(os.path.join(apply_dir, "IJ.out.x"))
    # round-trip: dumped matrix reads back identical
    A, _ = read_matrix_ascii(os.path.join(build_dir, "IJ.out.A"))
    assert (abs(A - s.A_host) > 1e-12).nnz == 0
    # dumped solution solves the system
    x, _ = read_vector_ascii(os.path.join(apply_dir, "IJ.out.x"))
    assert np.linalg.norm(np.ones(36) - s.A_host @ x) < 1e-6


def test_print_system_triggers():
    from hypredrive_tpu.linsys.printsys import PrintSystemContext
    from hypredrive_tpu.config.sections import PRINT_SYSTEM_SCHEMA

    def ctx(**kw):
        args = PRINT_SYSTEM_SCHEMA.defaults()
        args.update({"enable": True, **kw})
        return PrintSystemContext(args)

    c = ctx(trigger="every_n_systems", value=3)
    assert c.matches("build", 0) and not c.matches("build", 2)
    assert c.matches("build", 3)

    c = ctx(trigger="ids", value=[1, 4])
    assert not c.matches("build", 0) and c.matches("build", 4)

    c = ctx(trigger="ranges", value=[[2, 5]])
    assert c.matches("build", 3) and not c.matches("build", 6)

    c = ctx(trigger="selectors",
            value=[{"basis": "linear_system", "op": "over", "value": 10}])
    assert c.matches("build", 11) and not c.matches("build", 5)

    # stage filtering
    c = ctx(trigger="all", stages=["apply"])
    assert not c.matches("build", 0) and c.matches("apply", 0)


def test_adaptive_reuse_rebuilds_on_degradation():
    from hypredrive_tpu.precon.reuse import PreconReuseState
    from hypredrive_tpu.config.sections import REUSE_SCHEMA

    args = REUSE_SCHEMA.defaults()
    args.update({"enabled": True, "policy": 1})
    args["adaptive"].update({
        "rebuild_threshold": 0.5,
        "components": [{"metric": "iterations", "weight": 1.0,
                        "transform": {"kind": "relative_increase"},
                        "history": {"max_points": 1}}],
    })
    st = PreconReuseState(args)
    st.note_rebuild(0)

    class R:
        def __init__(self, iters):
            self.iters = iters
            self.solve_time = 0.01 * iters
            self.converged = True

    st.record_observation(0, None, R(10))     # baseline: 10 iters
    assert st.should_rebuild(1) is False      # no degradation
    st.record_observation(1, None, R(11))
    assert st.should_rebuild(2) is False      # +10% < 50% threshold
    st.record_observation(2, None, R(20))     # +100% ≥ 50%
    assert st.should_rebuild(3) is True


def test_reuse_guard_max_iteration_ratio():
    from hypredrive_tpu.precon.reuse import PreconReuseState
    from hypredrive_tpu.config.sections import REUSE_SCHEMA

    args = REUSE_SCHEMA.defaults()
    args.update({"enabled": True})
    args["guards"].update({"max_iteration_ratio": 1.5})
    st = PreconReuseState(args)
    st.note_rebuild(0)

    class R:
        def __init__(self, iters):
            self.iters = iters
            self.solve_time = 0.1
            self.converged = True

    st.record_observation(0, None, R(10))
    assert st.should_rebuild(1) is False
    st.record_observation(1, None, R(16))     # ratio 1.6 > 1.5
    assert st.should_rebuild(2) is True


def test_reuse_rebuild_on_failure():
    from hypredrive_tpu.precon.reuse import PreconReuseState
    from hypredrive_tpu.config.sections import REUSE_SCHEMA

    args = REUSE_SCHEMA.defaults()
    args.update({"enabled": True})
    st = PreconReuseState(args)
    st.note_rebuild(0)

    class R:
        iters = 100
        solve_time = 1.0
        converged = False

    st.record_observation(0, None, R())
    assert st.should_rebuild(1) is True


def test_per_timestep_reuse_rebuilds_at_boundaries(seq_file):
    """End-to-end ex7-style sequence: with per_timestep reuse, the
    preconditioner is built at ls 0, KEPT through ls 1 (same timestep),
    rebuilt at ls 2 (timestep table says timestep 1 starts there) and
    kept at ls 3 (ref: precon_reuse.h per_timestep +
    lsseq.c:2029-2107 timestep table feeding the schedule)."""
    path, systems = seq_file
    cfg = {
        "general": {},
        "linear_system": {"sequence_filename": path},
        "solver": {"gmres": {"relative_tol": 1e-8, "max_iter": 200}},
        "preconditioner": {"ilu": {}, "reuse": {
            "enabled": True, "per_timestep": True}},
    }
    drv = hd.HypreDrive()
    try:
        drv.input_args_from_dict(cfg)
        # schedule loaded from the lsseq timestep table at parse time
        assert drv._reuse_state is not None
        assert drv._reuse_state.ts_starts == [0, 2]
        precon_objs = []
        for k in range(4):
            drv.linear_system_build()
            drv.reset_initial_guess()
            drv.precon_create()
            precon_objs.append(drv.precon)
            drv.linear_solver_create()
            drv.linear_solver_setup()
            res = drv.linear_solver_apply()
            assert res.converged
            drv.precon_destroy()
            drv.linear_solver_destroy()
        # same object reused inside a timestep, fresh one across the
        # boundary: [p0, p0, p2, p2]
        assert precon_objs[1] is precon_objs[0]
        assert precon_objs[2] is not precon_objs[1]
        assert precon_objs[3] is precon_objs[2]
    finally:
        drv.destroy()


def test_timestep_file_schedule(tmp_path):
    """timestep_filename ASCII format: count line then 'timestep
    ls_start' lines (ref: src/internal/linsys.c:3195-3292)."""
    from hypredrive_tpu.precon.reuse import PreconReuseState
    from hypredrive_tpu.config.sections import REUSE_SCHEMA

    ts = tmp_path / "steps.txt"
    ts.write_text("3\n0 0\n1 2\n2 5\n")
    cfg = {
        "general": {},
        "linear_system": {
            "matrix_filename": "data/ps3d10pt7/np1/IJ.out.A",
            "rhs_mode": "ones",
            "timestep_filename": str(ts),
        },
        "solver": "pcg",
        "preconditioner": {"amg": {}, "reuse": {
            "enabled": True, "per_timestep": True}},
    }
    drv = hd.HypreDrive()
    try:
        drv.input_args_from_dict(cfg)
        st = drv._reuse_state
        assert st is not None
        assert st.ts_starts == [0, 2, 5]
        assert st.ts_ids == [0, 1, 2]
        # timestep index = last start <= ls_id
        assert st._timestep_of(0) == 0
        assert st._timestep_of(1) == 0
        assert st._timestep_of(2) == 1
        assert st._timestep_of(4) == 1
        assert st._timestep_of(5) == 2
    finally:
        drv.destroy()
    # malformed file → typed rejection
    bad = tmp_path / "bad.txt"
    bad.write_text("2\n0 0\n")
    cfg["linear_system"]["timestep_filename"] = str(bad)
    drv = hd.HypreDrive()
    try:
        with pytest.raises(hd.HypredrvError):
            drv.input_args_from_dict(cfg)
    finally:
        drv.destroy()


def test_reuse_rebuild_on_new_level():
    """guards.rebuild_on_new_level: watched stats-level depths trigger a
    rebuild when their active index moves (ref: precon_reuse.c:
    1304-1324)."""
    from hypredrive_tpu.precon.reuse import PreconReuseState
    from hypredrive_tpu.config.sections import REUSE_SCHEMA
    from hypredrive_tpu.core.stats import Stats

    args = REUSE_SCHEMA.defaults()
    args.update({"enabled": True})
    args["guards"].update({"rebuild_on_new_level": [0]})
    st = PreconReuseState(args)
    stats = Stats()

    class R:
        iters = 5
        solve_time = 0.1
        converged = True

    stats.annotate_level_begin("timestep", 0)
    st.note_rebuild(0, stats)
    st.record_observation(0, stats, R())
    assert st.should_rebuild(1, stats) is False     # same level
    stats.annotate_level_end("timestep", 0)
    stats.annotate_level_begin("timestep", 1)       # level 0 moved
    assert st.should_rebuild(1, stats) is True
    # depth 1 changes are NOT watched with [0]
    st.record_observation(1, stats, R())
    stats.annotate_level_begin("newton", 0)
    assert st.should_rebuild(2, stats) is False
    stats.annotate_level_end("newton", 0)
    stats.annotate_level_begin("newton", 1)
    assert st.should_rebuild(2, stats) is False


def test_reuse_should_keep_follows_decision():
    """should_keep mirrors HYPREDRV_PreconDestroy: evaluate the NEXT
    system's decision; static frequency N destroys exactly at the
    boundary (ref: src/HYPREDRV.c PreconDestroy)."""
    from hypredrive_tpu.precon.reuse import PreconReuseState
    from hypredrive_tpu.config.sections import REUSE_SCHEMA

    args = REUSE_SCHEMA.defaults()
    args.update({"enabled": True, "frequency": 2})
    st = PreconReuseState(args)
    st.note_rebuild(0)

    class R:
        iters = 5
        solve_time = 0.1
        converged = True

    st.record_observation(0, None, R())
    assert st.should_keep(0) is True      # next id 1: 1 % 2 != 0 → keep
    st.record_observation(1, None, R())
    assert st.should_keep(1) is False     # next id 2: boundary → destroy
    # frequency 3: keep inside the window, destroy at the boundary
    args3 = REUSE_SCHEMA.defaults()
    args3.update({"enabled": True, "frequency": 3})
    st3 = PreconReuseState(args3)
    st3.note_rebuild(0)
    st3.record_observation(0, None, R())
    assert st3.should_keep(0) is True     # next id 1
    st3.record_observation(1, None, R())
    assert st3.should_keep(1) is True     # next id 2
    st3.record_observation(2, None, R())
    assert st3.should_keep(2) is False    # next id 3: 3 % 3 == 0


def test_adaptive_amortization_and_history_reduction():
    """solve_overhead_vs_setup uses the amortization-window budget
    (ref: precon_reuse.c:1146-1165) and completed-level samples reduce
    with mean over num_solves (ref: PreconReuseSampleMetricGet)."""
    from hypredrive_tpu.precon.reuse import PreconReuseState
    from hypredrive_tpu.config.sections import REUSE_SCHEMA

    args = REUSE_SCHEMA.defaults()
    args.update({"enabled": True, "policy": 1})
    args["adaptive"].update({
        "rebuild_threshold": 0.5,
        "components": [{
            "metric": "solve_overhead_vs_setup", "weight": 1.0,
            "transform": {"amortization_window": 10},
            "history": {"max_points": 1},
        }],
    })
    st = PreconReuseState(args)
    st.note_rebuild(0)

    class R:
        def __init__(self, solve_time):
            self.iters = 5
            self.solve_time = solve_time
            self.converged = True

    class FakeStats:
        entries = [object()]
        _levels = []
        _level_records = []

        @staticmethod
        def setup_time():
            return 1.0       # budget = 1.0 / 10 = 0.1

    stats = FakeStats()
    st.record_observation(0, stats, R(0.2))   # baseline solve 0.2
    # drift +0.04 < budget 0.1 → score 0.4 < 0.5 → reuse
    st.record_observation(1, stats, R(0.24))
    assert st.should_rebuild(2, stats) is False
    # drift +0.2 = 2 budgets → score 2.0 ≥ 0.5 → rebuild
    st.record_observation(2, stats, R(0.4))
    assert st.should_rebuild(3, stats) is True


def test_adaptive_window_mean_baseline_and_means():
    """transform.baseline: window_mean compares each sample to the
    window average instead of the rebuild baseline; rms/harmonic/min/
    max means are available (ref: precon_reuse.h:48-52,
    k_mean_map precon_reuse.c:314-321)."""
    from hypredrive_tpu.precon.reuse import PreconReuseState
    from hypredrive_tpu.config.sections import REUSE_SCHEMA

    args = REUSE_SCHEMA.defaults()
    args.update({"enabled": True, "policy": 1})
    args["adaptive"].update({
        "rebuild_threshold": 0.10,
        "components": [{
            "metric": "iterations", "weight": 1.0,
            "transform": {"kind": "relative_increase",
                          "baseline": "window_mean"},
            "mean": {"kind": "max"},
            "history": {"max_points": 4},
        }],
    })
    st = PreconReuseState(args)
    st.note_rebuild(0)

    class R:
        def __init__(self, iters):
            self.iters = iters
            self.solve_time = 0.1
            self.converged = True

    for i, it in enumerate([10, 10, 10, 10]):
        st.record_observation(i, None, R(it))
    # flat history: every sample equals the window mean → score 0
    assert st.should_rebuild(4) is False
    # one spike: window mean 12.5, max relative increase (20-12.5)/12.5
    # = 0.6 ≥ 0.1 → rebuild
    st.record_observation(4, None, R(20))
    assert st.should_rebuild(5) is True
