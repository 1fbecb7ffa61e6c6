"""Vector kernels for Krylov solvers.

Plain jnp ops: under jit with sharded arrays XLA lowers these to
VPU-resident fused loops and inserts ``psum`` collectives for the
reductions automatically — the TPU-native replacement for hypre's
MPI_Allreduce dot products (ref: SURVEY §2.9).
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.vdot(a, b)


def norm2(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.vdot(a, a))


def norm1(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(jnp.abs(a))


def norm_inf(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.max(jnp.abs(a))


def axpy(alpha, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return alpha * x + y
