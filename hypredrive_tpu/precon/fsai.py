"""FSAI — factored sparse approximate inverse.

Reference: src/internal/fsai.c (algo bj-afsai/bj-sfsai; max_steps,
max_step_size, max_nnz_row, threshold, kap_tolerance).

For SPD A, find lower-triangular G ≈ L⁻¹ (A = LLᵀ) by minimizing
‖I − GL‖_F over a fixed sparsity pattern: each row i solves the small
dense SPD system  A[J_i,J_i] y = e_i  (J_i = chosen lower-triangle
pattern ∪ {i}), then scales so (GAGᵀ)_ii = 1.  The preconditioner apply
is z = Gᵀ(G r) — two SpMVs.

TPU-first: rows are *independent*, so setup is a single batched
Cholesky-solve over (n, k, k) padded submatrices — vmap straight onto
the MXU; no sequential factorization anywhere.  Pattern selection
(static FSAI): the max_nnz_row largest-|a_ij| strong lower-triangle
entries, thresholded (the adaptive variant grows J_i by max_steps ×
max_step_size entries; the static pattern with the same budget is the
TPU-friendly equivalent and matches hypre's bj-sfsai).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp

from .base import Preconditioner
from ..ops.device_matrix import EllMatrix


def _fsai_apply(state, r):
    G, GT = state
    return GT.matvec(G.matvec(r))


def build_fsai(A_host: sp.csr_matrix, max_nnz_row: int = 3,
               threshold: float = 1e-3, dtype=jnp.float64):
    """Construct G (and Gᵀ) as device EllMatrices."""
    A = sp.csr_matrix(A_host)
    A.sort_indices()
    n = A.shape[0]
    diag = A.diagonal()

    # pattern: per row, the largest |a_ij| entries with j < i (strict
    # lower), thresholded relative to the row max, capped at max_nnz_row
    counts = np.diff(A.indptr)
    rows = np.repeat(np.arange(n), counts)
    cols = A.indices
    vals = A.data
    lower = cols < rows
    absv = np.abs(vals)
    rowmax = np.zeros(n)
    np.maximum.at(rowmax, rows, np.where(lower, absv, 0.0))
    keep = lower & (absv >= threshold * np.maximum(rowmax[rows], 1e-300))
    # rank by |value| within row, keep top max_nnz_row
    key = np.where(keep, absv, -1.0)
    order = np.lexsort((-key, rows))
    starts = np.repeat(A.indptr[:-1], counts)
    rank = np.arange(A.nnz) - starts
    keep_sorted = keep[order] & (rank < max_nnz_row)
    keep = np.zeros(A.nnz, dtype=bool)
    keep[order] = keep_sorted

    # per-row pattern arrays, padded to k
    k = max_nnz_row + 1  # + the diagonal position
    pat = np.full((n, k), -1, dtype=np.int64)
    kept_rows = rows[keep]
    kept_cols = cols[keep]
    order2 = np.lexsort((kept_cols, kept_rows))
    kept_rows, kept_cols = kept_rows[order2], kept_cols[order2]
    starts_per_row = np.searchsorted(kept_rows, np.arange(n))
    for_pos = np.arange(len(kept_rows)) - starts_per_row[kept_rows]
    pat[kept_rows, for_pos] = kept_cols
    pat_count = np.bincount(kept_rows, minlength=n)
    pat[np.arange(n), pat_count] = np.arange(n)  # diagonal last
    sizes = pat_count + 1

    # gather padded dense submatrices A[J,J] — identity on pad slots
    safe_pat = np.where(pat >= 0, pat, 0)
    # dense lookup via row-wise searchsorted into CSR
    sub = np.zeros((n, k, k))
    valid = np.arange(k)[None, :] < sizes[:, None]
    # build (n, k, k) by looking up A[pat[i,a], pat[i,b]]
    # vectorized CSR lookup with (row,col) keys
    keys = rows.astype(np.int64) * n + cols
    # ensure keys sorted (CSR with sorted indices is sorted by (row, col))
    qa = np.repeat(safe_pat[:, :, None], k, axis=2)     # row index
    qb = np.repeat(safe_pat[:, None, :], k, axis=1)     # col index
    q = qa.astype(np.int64) * n + qb
    posq = np.searchsorted(keys, q.ravel())
    posq = np.minimum(posq, max(len(keys) - 1, 0))
    found = (keys[posq] == q.ravel()) if len(keys) else np.zeros(
        q.size, bool)
    sub = np.where(found, vals[posq], 0.0).reshape(n, k, k)
    pad_mask = ~(valid[:, :, None] & valid[:, None, :])
    eye = np.eye(k)[None, :, :]
    sub = np.where(pad_mask, np.broadcast_to(eye, sub.shape), sub)

    # batched solve A[J,J] y = e_last(valid) on device (MXU)
    sub_d = jnp.asarray(sub, dtype=jnp.float64)
    e = np.zeros((n, k))
    e[np.arange(n), sizes - 1] = 1.0
    e_d = jnp.asarray(e)

    def solve_one(M, rhs):
        return jnp.linalg.solve(M, rhs)

    y = np.asarray(jax.vmap(solve_one)(sub_d, e_d))

    # scale: G_ii = sqrt(1 / y_i) so that (G A Gᵀ)_ii = 1
    y_diag = y[np.arange(n), sizes - 1]
    y_diag = np.where(y_diag > 0, y_diag, 1.0 / np.maximum(diag, 1e-300))
    scale = 1.0 / np.sqrt(np.abs(y_diag))
    G_vals = y * scale[:, None]

    # assemble CSR G
    rws = np.repeat(np.arange(n), sizes)
    flat_cols = pat[valid]
    flat_vals = G_vals[valid]
    G = sp.csr_matrix((flat_vals, (rws, flat_cols)), shape=(n, n))
    G.sort_indices()
    GT = sp.csr_matrix(G.T)
    GT.sort_indices()
    return (EllMatrix.from_csr(G, dtype=dtype),
            EllMatrix.from_csr(GT, dtype=dtype))


class FSAIPrecon(Preconditioner):
    method = "fsai"
    apply_fn = staticmethod(_fsai_apply)

    def setup(self, system):
        A_host = system.M_host if system.M_host is not None else system.A_host
        if A_host is None:
            A_host = system.A.to_csr()
        # pattern budget: hypre bounds nnz by max_steps·max_step_size,
        # capped by max_nnz_row (ref: fsai.c field list)
        budget = min(int(self.args.get("max_steps", 5))
                     * int(self.args.get("max_step_size", 3)),
                     int(self.args.get("max_nnz_row", 15)))
        self.state = build_fsai(
            A_host,
            max_nnz_row=max(1, budget),
            threshold=float(self.args.get("threshold", 1e-3)),
            dtype=system.dtype)
        self.is_setup = True
