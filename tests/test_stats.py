"""Stats annotation state machine + table format (reference analogue:
tests/test_stats.c which drives the annotation machine directly)."""

import time

from hypredrive_tpu.core.stats import Stats, annotate


def test_entry_lifecycle():
    s = Stats(use_millisec=True)
    s.annotate_begin("matrix")
    time.sleep(0.001)
    s.annotate_end("matrix")
    s.annotate_begin("rhs")
    s.annotate_end("rhs")
    s.annotate_begin("prec")
    s.annotate_end("prec")
    s.annotate_begin("solve")
    s.annotate_end("solve")
    s.record_solve(6, 3.16e1, 4.98e-8)
    assert len(s.entries) == 1
    e = s.entries[0]
    assert e.ls_id == 0
    assert e.build_time > 0
    assert e.iters == 6
    assert s.num_iterations() == 6
    assert s.final_rel_res_norm() == 4.98e-8


def test_new_matrix_opens_new_entry():
    s = Stats()
    for _ in range(3):
        s.annotate_begin("matrix")
        s.annotate_end("matrix")
        s.record_solve(5, 1.0, 1e-7)
    assert len(s.entries) == 3
    assert [e.ls_id for e in s.entries] == [0, 1, 2]


def test_table_format_matches_reference():
    """Byte-parity with examples/refOutput/ex1.txt table layout."""
    s = Stats(use_millisec=True)
    s.annotate_begin("matrix")
    s.annotate_end("matrix")
    s.record_solve(6, 3.16e1, 4.98e-8)
    # Pin times for deterministic output
    s.entries[0].build_times = {"matrix": 1.500e-3}
    s.entries[0].setup_time = 1.286e-3
    s.entries[0].solve_time = 0.262e-3
    table = s.summary_table()
    assert "STATISTICS SUMMARY:" in table
    expected_sep = ("+--------+-------------+-------------+-------------+"
                    "------------+------------+--------+")
    assert expected_sep in table
    assert ("|        |    LS build |       setup |       solve |"
            "    initial |   relative |        |") in table
    assert ("|  Entry |  times [ms] |  times [ms] |  times [ms] |"
            "  res. norm |  res. norm |  iters |") in table
    assert ("|      0 |       1.500 |       1.286 |       0.262 |"
            "   3.16e+01 |   4.98e-08 |      6 |") in table


def test_seconds_unit():
    s = Stats(use_millisec=False)
    s.annotate_begin("matrix")
    s.annotate_end("matrix")
    table = s.summary_table()
    assert "times [s]" in table


def test_custom_annotations():
    s = Stats()
    with annotate(s, "Run", 0):
        pass
    with annotate(s, "Run", 1):
        pass
    table = s.summary_table()
    assert "run:0" in table and "run:1" in table


def test_level_annotations():
    s = Stats()
    s.annotate_level_begin("timestep", 1)
    s.annotate_level_begin("newton", 1)
    s.annotate_begin("matrix")
    s.annotate_end("matrix")
    s.record_solve(4, 1.0, 1e-9)
    s.annotate_level_end("newton", 1)
    s.annotate_level_end("timestep", 1)
    assert s.entries[0].path == "1.1"
    table = s.summary_table()
    assert "|  1.1.0 |" in table
    lvl = s.level_table()
    assert "timestep" in lvl and "newton" in lvl


def test_stats_filename_append(tmp_path):
    s = Stats()
    s.annotate_begin("matrix")
    s.annotate_end("matrix")
    path = tmp_path / "stats.txt"
    s.print(filename=str(path))
    s.print(filename=str(path))
    content = path.read_text()
    assert content.count("STATISTICS SUMMARY") == 2


def test_level_getters():
    """Programmatic level getters (ref: HYPREDRV_StatsLevelGet*,
    include/HYPREDRV.h:2223-2262)."""
    from hypredrive_tpu.core.stats import Stats
    import time as _t

    s = Stats()
    for step in (1, 2):
        s.annotate_level_begin("timestep", step)
        s.annotate_begin("matrix"); s.annotate_end("matrix")
        s.annotate_begin("solve"); _t.sleep(0.01); s.annotate_end("solve")
        s.record_solve(iters=3 + step, initial_res_norm=1.0, rel_res_norm=1e-9, converged=True)
        s.annotate_level_end("timestep", step)

    recs = s.level_records("timestep")
    assert [r["index"] for r in recs] == [1, 2]
    assert s.level_time("timestep") >= 0.02
    assert s.level_time("timestep", 1) > 0
    assert s.level_entry_range("timestep", 2) == (1, 2)
    assert s.level_records("nope") == []


def test_level_aggregate_summary():
    """Aggregate Summary per level name (ref: stats.c StatsLevelPrint
    totals + per-solve / per-frame averages)."""
    from hypredrive_tpu.core.stats import Stats

    st = Stats()
    for ts in range(3):
        st.annotate_level_begin("timestep", ts)
        for _ in range(2):
            st.annotate_begin("matrix"); st.annotate_end("matrix")
            st.annotate_begin("prec"); st.annotate_end("prec")
            st.annotate_begin("solve"); st.annotate_end("solve")
            st.record_solve(iters=4 + ts, rel_res_norm=1e-8,
                            initial_res_norm=1.0, converged=True)
        st.annotate_level_end("timestep", ts)
    agg = st.level_aggregate("timestep")
    assert agg["frames"] == 3
    assert agg["total_solves"] == 6
    assert agg["total_iters"] == 2 * (4 + 5 + 6)
    assert abs(agg["avg_iters_per_solve"] - 5.0) < 1e-12
    assert abs(agg["avg_iters_per_frame"] - 10.0) < 1e-12
    txt = st.level_table()
    assert "Aggregate Summary (timestep):" in txt
    assert "Total number of linear iterations:     30" in txt


def test_stats_level_entry_summary_getters():
    """stats_level_get_count / get_entry_summary mirror the reference's
    HYPREDRV_StatsLevelGetCount/GetEntry rollups."""
    import hypredrive_tpu as hd
    from hypredrive_tpu.core.errors import HypredrvError

    drv = hd.HypreDrive()
    try:
        drv.input_args_from_dict({
            "linear_system": {"generate": {"kind": "laplacian_5pt",
                                           "nx": 6}, "rhs_mode": "ones"},
            "solver": {"pcg": {"relative_tol": 1e-8}},
            "preconditioner": "jacobi"})
        for t in range(2):
            drv.annotate_level_begin("timestep", t)
            drv.linear_system_build()
            drv.reset_initial_guess()
            drv.precon_create(); drv.linear_solver_create()
            drv.linear_solver_setup()
            res = drv.linear_solver_apply()
            drv.precon_destroy(); drv.linear_solver_destroy()
            drv.annotate_level_end("timestep", t)
        assert drv.stats_level_get_count("timestep") == 2
        ns, iters, setup, solve = drv.stats_level_get_entry_summary(
            "timestep", 0)
        assert ns == 1 and iters == res.iters
        assert solve > 0.0
        import pytest as _pytest
        with _pytest.raises(HypredrvError):
            drv.stats_level_get_entry_summary("timestep", 5)
    finally:
        drv.destroy()
