#!/usr/bin/env python
"""Benchmark the Pallas gather-SpMV on real AMG coarse operators."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np


def main():
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/hypredrive_tpu/jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hypredrive_tpu.ops.csr import laplacian_3d_7pt
    from hypredrive_tpu.precon.amg.hierarchy import setup_hierarchy
    from hypredrive_tpu.config.sections import AMG_SCHEMA
    from hypredrive_tpu.ops.gather_plan import build_plan, plan_stats
    from hypredrive_tpu.ops.pallas_spmv import GatherSpMV

    dtype = jnp.float32
    A_host = laplacian_3d_7pt(64, dtype=np.float32)
    state = setup_hierarchy(A_host, AMG_SCHEMA.defaults(), dtype=dtype)

    def timed_loop(fn, x0, reps):
        @jax.jit
        def loop(x):
            return jax.lax.fori_loop(
                0, reps, lambda i, a: fn(a) * 1e-9 + a[:len(a)], x)
        loop(x0)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(x0))
            best = min(best, time.perf_counter() - t0)
        return best / reps

    rng = np.random.default_rng(0)
    for li, lvl in enumerate(state.levels[1:4], start=1):
        A = lvl.A.to_csr().tocoo()
        m, n = A.shape
        plan = build_plan(A.row, A.col, A.data, m, n)
        npass, fill = plan_stats(plan)
        print(f"lvl{li}: n={m} nnz={A.nnz} passes={npass} fill={fill:.2f}",
              flush=True)
        op = GatherSpMV(plan, dtype=dtype)
        x = jnp.asarray(rng.standard_normal(n), dtype)
        try:
            y = np.asarray(op(x))
            ref = A @ np.asarray(x)
            err = np.abs(y - ref).max() / np.abs(ref).max()
            print(f"  correct: rel err {err:.2e}", flush=True)
            reps = 500 if m > 10000 else 1000
            t = timed_loop(lambda v: op(v)[:n], x, reps)
            print(f"  pallas: {t*1e6:9.1f} us  {A.nnz/t/1e9:6.2f} Gnnz/s",
                  flush=True)
        except Exception as e:
            print(f"  FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
