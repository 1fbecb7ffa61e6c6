#!/usr/bin/env python
"""Benchmark: SpMV + AMG V-cycle nnz/s/chip and PCG iters/wall-time.

Matches the driver metric contract (BASELINE.json): prints ONE JSON line
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value        = SpMV nnz/s on one chip (f32, 7-pt Laplacian, 262k rows)
vs_baseline  = reference iteration parity on the ex1-class system:
               hypre_iters(6; examples/refOutput/ex1.txt) / our_iters —
               ≥ 1.0 means we match or beat hypre's convergence.
Extra keys give the V-cycle throughput and solve wall time for the
record; they don't replace the contract fields.

Timing methodology (round 5): the remote-TPU tunnel costs a ~26 ms
fixed round-trip per dispatch+readback, which at 2000 reps added a
phantom ~13 us/rep to every per-op number in rounds 1-4 (r04's
"22.8 Gnnz/s" SpMV was really ~27 true device Gnnz/s measured against
a triad that was really ~2.1 TB/s, not 602 GB/s).  All per-op
throughputs below are therefore SLOPE-timed: run the on-device
fori_loop at two rep counts and divide the wall-time difference by the
rep difference — the tunnel fixed cost cancels exactly.  Wall-clock
numbers that a user actually experiences (setup, full solve) stay raw
and include the tunnel cost; the measured round-trip is reported as
`tunnel_roundtrip_ms` for the record.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def slope_time(make_fn, args, r1, r2, trials=5):
    """Median of ((t(r2) - t(r1)) / (r2 - r1)) — per-rep device time with
    the dispatch/readback fixed cost cancelled."""
    f1, f2 = make_fn(r1), make_fn(r2)
    np.asarray(f1(*args))
    np.asarray(f2(*args))
    ss = []
    for _ in range(trials):
        t0 = time.perf_counter()
        np.asarray(f1(*args))
        d1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(f2(*args))
        d2 = time.perf_counter() - t0
        ss.append((d2 - d1) / (r2 - r1))
    ss.sort()
    return ss[len(ss) // 2]


def main():
    import jax
    import jax.numpy as jnp

    plat = os.environ.get("JAX_PLATFORMS", "default") or "default"
    cache = os.path.join(
        os.environ.get("HYPREDRV_CACHE_DIR",
                       os.path.expanduser("~/.cache/hypredrive_tpu/jax")),
        plat.replace(",", "_"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    from hypredrive_tpu.ops.csr import laplacian_3d_7pt
    from hypredrive_tpu.ops.device_matrix import EllMatrix
    from hypredrive_tpu.precon.amg.hierarchy import setup_hierarchy
    from hypredrive_tpu.precon.amg.cycle import amg_apply
    from hypredrive_tpu.solvers.pcg import _pcg_core
    from hypredrive_tpu.config.sections import AMG_SCHEMA

    dtype = jnp.float32
    nx = int(os.environ.get("HYPREDRV_BENCH_NX", "64"))

    A_host = laplacian_3d_7pt(nx, dtype=np.float32)
    n = A_host.shape[0]
    nnz = A_host.nnz

    # ---- backend bring-up, instrumented ----------------------------------
    # r04 recorded backend_init_s=865 with no breakdown; each sub-phase is
    # now timed so a cold-compile-cache run is distinguishable from a slow
    # tunnel attach.  Bring-up is a process-scoped one-time cost, not AMG
    # setup (the reference's HYPRE_Initialize is likewise outside its
    # setup timers).
    t0 = time.perf_counter()
    jax.devices()
    attach_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    np.asarray(jax.device_put(np.ones(8, np.float32)) + 1.0)
    first_transfer_s = time.perf_counter() - t0

    # measured tunnel round-trip: dispatch + tiny readback of an
    # already-compiled trivial op
    one = jax.jit(lambda v: v + 1.0)
    np.asarray(one(jnp.ones(8, dtype)))
    t0 = time.perf_counter()
    for _ in range(5):
        np.asarray(one(jnp.ones(8, dtype)))
    tunnel_rt_s = (time.perf_counter() - t0) / 5

    # warmup: on semantics (ref: docs/usrman-src/input_structure.rst:35,
    # help.c:905 "untimed warmup solve before measured solves") — a tiny
    # full setup touches every numpy/scipy/XLA dispatch path once so the
    # measured setup is the algorithm, not first-touch/compile costs.
    t0 = time.perf_counter()
    Aw = laplacian_3d_7pt(8, dtype=np.float32)
    jax.block_until_ready(jax.tree_util.tree_leaves(
        setup_hierarchy(Aw, AMG_SCHEMA.defaults(), dtype=dtype)))
    jax.block_until_ready(
        EllMatrix.from_csr(Aw, dtype=dtype).matvec(
            jnp.ones(Aw.shape[0], dtype)))
    warm_compile_s = time.perf_counter() - t0
    backend_init_s = attach_s + first_transfer_s + warm_compile_s

    # ---- AMG setup (cold = first full-size pass incl. jit compiles) ------
    t0 = time.perf_counter()
    A = EllMatrix.from_csr(A_host, dtype=dtype)
    state = setup_hierarchy(A_host, AMG_SCHEMA.defaults(), dtype=dtype,
                            fine_matrix=A)
    jax.block_until_ready(jax.tree_util.tree_leaves(state))
    setup_cold_time = time.perf_counter() - t0
    # warm setup: median of 3 passes — each is an honest wall time
    # (blocks on EVERY leaf so the pipelined per-level transfers land),
    # the median de-noises remote-tunnel hiccups that can double a
    # single pass
    setup_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        A = EllMatrix.from_csr(A_host, dtype=dtype)
        state = setup_hierarchy(A_host, AMG_SCHEMA.defaults(), dtype=dtype,
                                fine_matrix=A)
        jax.block_until_ready(jax.tree_util.tree_leaves(state))
        setup_times.append(time.perf_counter() - t0)
    setup_time = sorted(setup_times)[1]

    x = jnp.ones(n, dtype=dtype)
    b = jnp.ones(n, dtype=dtype)

    # ---- device stream calibration (roofline context) --------------------
    # triad over operands well past VMEM capacity (v5e keeps a 64 MB
    # loop-resident operand in VMEM and "measures" 2.1 TB/s; 512 MB
    # forces HBM and lands at the ~819 GB/s spec class), slope-timed.
    # w' = v + 2w reads v,w and writes w: 3 accesses/element/rep.
    ns = 1 << 27
    u = jnp.ones(ns, dtype)
    v = jnp.ones(ns, dtype)

    def mk_stream(r):
        @jax.jit
        def f(u, v):
            w = jax.lax.fori_loop(0, r, lambda _, w: v + 2.0 * w, u)
            return jnp.sum(w)
        return f

    st = slope_time(mk_stream, (u, v), 20, 80)
    stream_gbs = ns * 4 * 3 / st / 1e9
    del u, v

    # ---- SpMV throughput -------------------------------------------------
    def mk_spmv(r):
        @jax.jit
        def f(A, x):
            def body(_, vv):
                w = A.matvec(vv)
                return w / jnp.max(jnp.abs(w))
            return jax.lax.fori_loop(0, r, body, x)
        return f

    spmv_t = slope_time(mk_spmv, (A, x), 2000, 8000)
    spmv_nnz_s = nnz / spmv_t

    # ---- AMG V-cycle throughput ------------------------------------------
    def mk_vcyc(r):
        @jax.jit
        def f(s, rr):
            def body(_, vv):
                w = amg_apply(s, vv)
                return w / jnp.max(jnp.abs(w))
            return jax.lax.fori_loop(0, r, body, rr)
        return f

    # nnz touched per cycle: smoothing sweeps + residual on each level
    # (pre+post Chebyshev(order) ≈ 2·order−1 SpMVs each + 1 residual) + P/R
    cyc_nnz = 0
    for lv in state.levels[:-1]:
        sweeps = lv.pre_sweeps + lv.post_sweeps
        order = (lv.smooth_arrays[3].shape[0]
                 if lv.smoother == "chebyshev" else 1)
        cyc_nnz += lv.A.nnz * (sweeps * (2 * order - 1) + 1)
        cyc_nnz += lv.P.nnz + lv.R.nnz
    vcyc_t = slope_time(mk_vcyc, (state, b), 200, 800)
    vcyc_nnz_s = cyc_nnz / vcyc_t

    # ---- full solve to rtol=1e-8 (warm; raw wall incl. one round-trip) ---
    @jax.jit
    def solve(A, state, b, x0):
        mv = lambda v: A.matvec(v)
        pc = lambda r: amg_apply(state, r)
        return _pcg_core(mv, pc, b, x0, jnp.asarray(1e-8, dtype),
                         jnp.asarray(0.0, dtype), 100, True, 0)

    x0 = jnp.zeros(n, dtype=dtype)
    np.asarray(solve(A, state, b, x0)[0])  # compile + warm
    t0 = time.perf_counter()
    xs, iters, norm, done, _ = solve(A, state, b, x0)
    np.asarray(xs)
    solve_t = time.perf_counter() - t0
    iters_big = int(iters)

    # device-only solve time: repeat the whole solve on device and
    # slope-time it (the raw wall above is tunnel-latency-bound — a
    # 10-iteration and a 40-iteration solve measure the same wall)
    def mk_solve_loop(r):
        @jax.jit
        def f(A, state, b, x0):
            def body(_, acc):
                xs, it, nm, dn, _h = _pcg_core(
                    lambda v: A.matvec(v), lambda rr: amg_apply(state, rr),
                    b, x0 + acc * 1e-30, jnp.asarray(1e-8, dtype),
                    jnp.asarray(0.0, dtype), 100, True, 0)
                return xs[0]
            return jax.lax.fori_loop(0, r, body, jnp.asarray(0.0, dtype))
        return f

    solve_dev_t = slope_time(mk_solve_loop, (A, state, b, x0), 4, 16,
                             trials=3)

    # ---- ex1-class parity (hypre: 6 iters @ rtol 1e-6, refOutput/ex1.txt)
    @jax.jit
    def solve_ex1(A, state, b, x0):
        mv = lambda v: A.matvec(v)
        pc = lambda r: amg_apply(state, r)
        return _pcg_core(mv, pc, b, x0, jnp.asarray(1e-6, dtype),
                         jnp.asarray(0.0, dtype), 100, True, 0)

    A1_host = laplacian_3d_7pt(10, dtype=np.float32)
    A1 = EllMatrix.from_csr(A1_host, dtype=dtype)
    s1 = setup_hierarchy(A1_host, AMG_SCHEMA.defaults(), dtype=dtype)
    b1 = jnp.ones(1000, dtype=dtype)
    out1 = solve_ex1(A1, s1, b1, jnp.zeros(1000, dtype=dtype))
    ex1_iters = max(1, int(out1[1]))
    vs_baseline = 6.0 / ex1_iters

    print(json.dumps({
        "metric": "spmv_nnz_per_s_per_chip",
        "value": round(spmv_nnz_s),
        "unit": "nnz/s",
        "vs_baseline": round(vs_baseline, 3),
        "extra": {
            "backend": jax.default_backend(),
            "problem": f"laplacian_7pt {nx}^3 (n={n}, nnz={nnz}) f32",
            "timing": "slope-timed per-op (tunnel fixed cost cancelled); "
                      "setup/solve are raw wall",
            "amg_vcycle_nnz_per_s": round(vcyc_nnz_s),
            "amg_levels": len(state.levels),
            "pcg_amg_iters_to_1e-8": iters_big,
            "pcg_amg_solve_s": round(solve_t, 4),
            "pcg_amg_solve_device_s": round(solve_dev_t, 4),
            "amg_setup_s": round(setup_time, 3),
            "amg_setup_passes_s": [round(t, 3) for t in setup_times],
            "amg_setup_cold_s": round(setup_cold_time, 3),
            "backend_init_s": round(backend_init_s, 3),
            "backend_init_breakdown_s": {
                "device_attach": round(attach_s, 3),
                "first_transfer": round(first_transfer_s, 3),
                "warmup_jit_compiles": round(warm_compile_s, 3),
            },
            "tunnel_roundtrip_ms": round(tunnel_rt_s * 1e3, 2),
            "stream_triad_gbs": round(stream_gbs, 2),
            # minimal-traffic model: D diagonal rows + x + y per SpMV
            "spmv_effective_gbs": round(
                n * (len(A.dia_offsets) + 2) * 4 / spmv_t / 1e9, 2),
            "ex1_iters": ex1_iters,
            "ex1_ref_iters": 6,
        },
    }))


if __name__ == "__main__":
    main()
