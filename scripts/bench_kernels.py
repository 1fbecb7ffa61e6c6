#!/usr/bin/env python
"""Kernel microbenchmarks on the real TPU chip.

Establishes the speed-of-light context for the SpMV hot path:
  * saxpy            — pure VPU streaming (HBM bandwidth ceiling)
  * dia_xla          — current EllMatrix.matvec (dynamic_slice per diag)
  * dia_pallas       — Pallas kernel: one x pass in VMEM, all diagonals
  * vcycle           — AMG V-cycle apply

All loops repeat on-device (lax.fori_loop / scan) with one readback,
because per-dispatch latency through the axon tunnel is ~20 ms.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def timed(fn, *args, reps_outer=3):
    # warm (compile) + best-of-3
    fn(*args)
    best = float("inf")
    for _ in range(reps_outer):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cache = os.path.expanduser("~/.cache/hypredrive_tpu/jax")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hypredrive_tpu.ops.csr import laplacian_3d_7pt
    from hypredrive_tpu.ops.device_matrix import EllMatrix

    REPS = 100
    nx = int(os.environ.get("BK_NX", "64"))
    dtype = jnp.float32

    A_host = laplacian_3d_7pt(nx, dtype=np.float32)
    n = A_host.shape[0]
    nnz = A_host.nnz
    A = EllMatrix.from_csr(A_host, dtype=dtype)
    print(f"n={n} nnz={nnz} dia_offsets={A.dia_offsets} "
          f"ell_k={A.k} tail={A.tail_rows.shape[0]}", flush=True)

    x = jnp.ones(n, dtype)
    y = jnp.ones(n, dtype)

    # -- 1. saxpy bandwidth ------------------------------------------------
    @jax.jit
    def saxpy_loop(x, y):
        def body(i, acc):
            return y + 1.5 * acc
        return jax.lax.fori_loop(0, REPS, body, x)

    t = timed(saxpy_loop, x, y) / REPS
    bw = 3 * n * 4 / t / 1e9
    print(f"saxpy:       {t*1e6:9.1f} us  {bw:7.1f} GB/s", flush=True)

    # -- 2. current matvec -------------------------------------------------
    @jax.jit
    def mv_loop(A, x):
        def body(i, acc):
            return A.matvec(acc)
        return jax.lax.fori_loop(0, REPS, body, x)

    t = timed(mv_loop, A, x) / REPS
    print(f"dia_xla:     {t*1e6:9.1f} us  {nnz/t/1e9:7.2f} Gnnz/s "
          f"({(nnz*4 + 2*n*4)/t/1e9:6.1f} GB/s eff)", flush=True)

    # -- 3. pallas DIA kernel ---------------------------------------------
    offs = A.dia_offsets
    D = len(offs)
    lo = max(0, -min(offs))
    hi = max(0, max(offs))
    TILE = 8 * 128 * 4

    n_pad = ((n + TILE - 1) // TILE) * TILE
    dia_host = np.zeros((D, n_pad), np.float32)
    dia_host[:, :n] = np.asarray(A.dia_data)
    dia = jnp.asarray(dia_host)

    def dia_kernel(x_ref, dia_ref, y_ref):
        i = pl.program_id(0)
        base = i * TILE
        acc = dia_ref[0, :] * x_ref[pl.ds(base + offs[0] - (-lo), TILE)]
        for d in range(1, D):
            acc += dia_ref[d, :] * x_ref[pl.ds(base + offs[d] + lo, TILE)]
        y_ref[:] = acc

    grid = n_pad // TILE

    @jax.jit
    def pallas_mv(dia, xp):
        return pl.pallas_call(
            dia_kernel,
            out_shape=jax.ShapeDtypeStruct((n_pad,), dtype),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),   # x stays whole
                pl.BlockSpec((D, TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
        )(xp, dia)

    # x padded with halo on both sides
    xp = jnp.concatenate([jnp.zeros(lo, dtype), x,
                          jnp.zeros(hi + n_pad - n, dtype)])

    def dia_kernel_vmem(x_ref, dia_ref, y_ref):
        i = pl.program_id(0)
        base = i * TILE
        acc = dia_ref[0, :] * x_ref[pl.ds(base + offs[0] + lo, TILE)]
        for d in range(1, D):
            acc += dia_ref[d, :] * x_ref[pl.ds(base + offs[d] + lo, TILE)]
        y_ref[:] = acc

    @jax.jit
    def pallas_mv_vmem(dia, xp):
        return pl.pallas_call(
            dia_kernel_vmem,
            out_shape=jax.ShapeDtypeStruct((n_pad,), dtype),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # full x in VMEM
                pl.BlockSpec((D, TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
        )(xp, dia)

    try:
        @jax.jit
        def pmv_loop(dia, xp):
            def body(i, acc):
                out = pallas_mv_vmem(dia, acc)
                return jax.lax.dynamic_update_slice(acc, out, (lo,))
            return jax.lax.fori_loop(0, REPS, body, xp)

        t = timed(pmv_loop, dia, xp) / REPS
        print(f"dia_pallas:  {t*1e6:9.1f} us  {nnz/t/1e9:7.2f} Gnnz/s "
              f"({(nnz*4 + 2*n*4)/t/1e9:6.1f} GB/s eff)", flush=True)
    except Exception as e:
        print(f"dia_pallas FAILED: {type(e).__name__}: {str(e)[:500]}",
              flush=True)

    # -- 4. V-cycle --------------------------------------------------------
    from hypredrive_tpu.precon.amg.hierarchy import setup_hierarchy
    from hypredrive_tpu.precon.amg.cycle import amg_apply
    from hypredrive_tpu.config.sections import AMG_SCHEMA

    state = setup_hierarchy(A_host, AMG_SCHEMA.defaults(), dtype=dtype)
    b = jnp.ones(n, dtype)

    @jax.jit
    def vc_loop(state, b):
        def body(i, acc):
            return amg_apply(state, acc)
        return jax.lax.fori_loop(0, REPS, body, b)

    t = timed(vc_loop, state, b) / REPS
    print(f"vcycle:      {t*1e6:9.1f} us  {nnz/t/1e9:7.2f} Gnnz/s", flush=True)


if __name__ == "__main__":
    main()
