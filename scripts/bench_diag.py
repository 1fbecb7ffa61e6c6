#!/usr/bin/env python
"""Diagnose the V-cycle slowness: per-level layout + per-op timings."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/hypredrive_tpu/jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hypredrive_tpu.ops.csr import laplacian_3d_7pt
    from hypredrive_tpu.ops.device_matrix import EllMatrix
    from hypredrive_tpu.precon.amg.hierarchy import setup_hierarchy
    from hypredrive_tpu.config.sections import AMG_SCHEMA

    dtype = jnp.float32
    A_host = laplacian_3d_7pt(64, dtype=np.float32)
    state = setup_hierarchy(A_host, AMG_SCHEMA.defaults(), dtype=dtype)

    # hierarchy composition (host-side print)
    print("lvl |     n    |   nnz    | D(dia) |  k(ell) | tail", flush=True)
    for i, lvl in enumerate(state.levels):
        A = lvl.A
        print(f"{i:3d} | {A.shape[0]:8d} | {A.nnz:8d} | "
              f"{len(A.dia_offsets):6d} | {A.k:7d} | {A.tail_rows.shape[0]}",
              flush=True)
        P = getattr(lvl, "P", None)
        if P is not None:
            print(f"    |  P: {P.shape} nnz={P.nnz} D={len(P.dia_offsets)} "
                  f"k={P.k} tail={P.tail_rows.shape[0]}", flush=True)

    def timed_loop(fn, x0, reps):
        @jax.jit
        def loop(x):
            return jax.lax.fori_loop(0, reps, lambda i, a: fn(a), x)
        loop(x0)  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(x0))
            best = min(best, time.perf_counter() - t0)
        return best / reps

    # dispatch+readback overhead
    t_over = timed_loop(lambda a: a + 1.0, jnp.zeros((8, 128), dtype), 1)
    print(f"overhead (1-op loop + readback): {t_over*1e3:.2f} ms", flush=True)

    # saxpy with enough reps
    n = 1 << 22
    x = jnp.ones(n, dtype)
    t = timed_loop(lambda a: 1.000001 * a + 0.5, x, 2000)
    print(f"saxpy 16MB/rep: {t*1e6:.1f} us  {2*n*4/t/1e9:.0f} GB/s", flush=True)

    # per-level matvec cost
    for i, lvl in enumerate(state.levels):
        A = lvl.A
        xi = jnp.ones(A.shape[1], dtype)
        reps = 2000 if i else 500
        t = timed_loop(lambda v: A.matvec(v)[:A.shape[1]] if A.shape[0] != A.shape[1] else A.matvec(v), xi, reps)
        print(f"matvec lvl{i}: {t*1e6:9.1f} us  {A.nnz/t/1e9:6.2f} Gnnz/s",
              flush=True)

    # pure gather cost at level-0 scale
    n0 = A_host.shape[0]
    idx = jnp.asarray(np.random.randint(0, n0, (n0, 7)), jnp.int32)
    xg = jnp.ones(n0, dtype)
    t = timed_loop(lambda v: jnp.sum(v[idx], axis=1) * 1e-6 + v, xg, 200)
    print(f"gather(n,7): {t*1e6:9.1f} us  {7*n0/t/1e9:6.2f} Gidx/s", flush=True)

    # minimal pallas probe
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def k(x_ref, o_ref):
            o_ref[:] = x_ref[:] * 2.0

        y = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.ones((8, 128), dtype))
        print("pallas minimal: OK", np.asarray(y)[0, 0], flush=True)
    except Exception as e:
        print(f"pallas minimal FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)

if __name__ == "__main__":
    main()
