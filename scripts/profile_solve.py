#!/usr/bin/env python
"""Run a config under the JAX profiler and summarize annotation spans.

Equivalent of the reference's Caliper integration + analyze_caliper.py
(ref: include/internal/stats.h:47-80): phases are bracketed by the stats
annotator; this script additionally captures a full XLA trace viewable
in Perfetto/TensorBoard.

Usage:
  python scripts/profile_solve.py examples/ex1.yml --trace-dir /tmp/trace
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("config")
    ap.add_argument("--trace-dir", default=None,
                    help="write a Perfetto/TensorBoard trace here")
    args = ap.parse_args(argv)

    import contextlib
    import jax
    import hypredrive_tpu as hd

    ctx = (jax.profiler.trace(args.trace_dir) if args.trace_dir
           else contextlib.nullcontext())
    drv = hd.HypreDrive()
    try:
        with ctx:
            drv.input_args_parse(args.config)
            with jax.profiler.TraceAnnotation("linear_system_build"):
                drv.linear_system_build()
            with jax.profiler.TraceAnnotation("precon_setup"):
                drv.precon_create()
                drv.linear_solver_create()
                drv.linear_solver_setup()
            with jax.profiler.TraceAnnotation("solve"):
                res = drv.linear_solver_apply()
        drv.stats_print()
        print(f"\nconverged={res.converged} iters={res.iters} "
              f"relres={res.rel_res_norm:.3e}")
        if args.trace_dir:
            print(f"trace written to {args.trace_dir} "
                  f"(open with Perfetto or TensorBoard)")
        return 0
    finally:
        drv.destroy()


if __name__ == "__main__":
    sys.exit(main())
