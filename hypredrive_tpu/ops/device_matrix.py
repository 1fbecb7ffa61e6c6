"""Device-resident sparse matrix: padded ELL + COO tail ("hybrid").

TPU-first design notes (this replaces hypre's CSR SpMV — the #1 hot kernel,
ref: SURVEY §2.9/§6 — with an XLA/Pallas-friendly layout):

* **Static shapes.** Rows are padded to a fixed ``K`` nnz/row (ELL). The
  rare long rows spill into a fixed-size COO tail.  Everything the solve
  phase touches has compile-time shape, so one XLA compilation serves a
  whole sequence of same-pattern systems (pairs with lsseq pattern dedup).
* **Vectorized gather.** SpMV is ``(vals * x[cols]).sum(axis=1)`` — a
  2-D gather plus a small-axis reduction, which XLA maps onto the VPU with
  full HBM-bandwidth utilization; the COO tail uses ``segment_sum``.
* **Pad safety.** Padding uses column 0 with value 0, so no masking is
  needed in the inner loop.

For multi-chip execution the same structure holds per-shard with columns
remapped into [local | halo] positions (see parallel/dist_matrix.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_pytree_node_class
@dataclass
class EllMatrix:
    """Hybrid ELL+COO sparse matrix on device.

    cols:  (n_rows, K) int32 — gather indices into x (pad → 0)
    vals:  (n_rows, K) dtype — coefficients (pad → 0)
    tail_rows/tail_cols/tail_vals: (T,) COO spill for rows with >K nnz
    shape: (n_rows, n_cols) — static
    """

    cols: jnp.ndarray
    vals: jnp.ndarray
    tail_rows: jnp.ndarray
    tail_cols: jnp.ndarray
    tail_vals: jnp.ndarray
    shape: Tuple[int, int]
    nnz: int

    def tree_flatten(self):
        children = (self.cols, self.vals, self.tail_rows, self.tail_cols,
                    self.tail_vals)
        aux = (self.shape, self.nnz)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        cols, vals, tr, tc, tv = children
        shape, nnz = aux
        return cls(cols, vals, tr, tc, tv, shape, nnz)

    # -- construction -----------------------------------------------------

    @classmethod
    def from_csr(cls, A: sp.csr_matrix, dtype=jnp.float64,
                 k: Optional[int] = None, k_cap: int = 64) -> "EllMatrix":
        A = sp.csr_matrix(A)
        A.sort_indices()
        n_rows, n_cols = A.shape
        row_nnz = np.diff(A.indptr)
        max_nnz = int(row_nnz.max(initial=0))
        if k is None:
            k = min(max_nnz, k_cap)
        k = max(k, 1)

        cols = np.zeros((n_rows, k), dtype=np.int32)
        vals = np.zeros((n_rows, k), dtype=np.float64)
        # Vectorized ELL fill: position of each nnz within its row
        rows_all = np.repeat(np.arange(n_rows), row_nnz)
        pos_in_row = np.arange(A.nnz) - np.repeat(A.indptr[:-1], row_nnz)
        ell = pos_in_row < k
        cols[rows_all[ell], pos_in_row[ell]] = A.indices[ell]
        vals[rows_all[ell], pos_in_row[ell]] = A.data[ell]
        spill = ~ell
        tail_r = rows_all[spill]
        tail_c = A.indices[spill]
        tail_v = A.data[spill]

        t = len(tail_r)
        t_pad = max(_round_up(t, 128), 128) if t else 0
        tr = np.zeros(t_pad, dtype=np.int32)
        tc = np.zeros(t_pad, dtype=np.int32)
        tv = np.zeros(t_pad, dtype=np.float64)
        tr[:t] = tail_r
        tc[:t] = tail_c
        tv[:t] = tail_v

        return cls(
            cols=jnp.asarray(cols),
            vals=jnp.asarray(vals, dtype=dtype),
            tail_rows=jnp.asarray(tr),
            tail_cols=jnp.asarray(tc),
            tail_vals=jnp.asarray(tv, dtype=dtype),
            shape=(n_rows, n_cols),
            nnz=int(A.nnz),
        )

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def k(self) -> int:
        return self.cols.shape[1]

    @property
    def has_tail(self) -> bool:
        return self.tail_rows.shape[0] > 0

    # -- kernels ----------------------------------------------------------

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """y = A @ x (jit-safe)."""
        gathered = x[self.cols]                       # (n, K) gather
        y = jnp.einsum("rk,rk->r", self.vals, gathered)
        if self.has_tail:
            y = y + jax.ops.segment_sum(
                self.tail_vals * x[self.tail_cols], self.tail_rows,
                num_segments=self.shape[0])
        return y

    def __matmul__(self, x):
        return self.matvec(x)

    def diagonal(self) -> jnp.ndarray:
        """Extract diag(A) on device (rows where col == row index)."""
        n = self.shape[0]
        row_ids = jnp.arange(n, dtype=self.cols.dtype)[:, None]
        d = jnp.sum(jnp.where(self.cols == row_ids, self.vals, 0.0), axis=1)
        if self.has_tail:
            mask = self.tail_rows == self.tail_cols
            d = d + jax.ops.segment_sum(
                jnp.where(mask, self.tail_vals, 0.0), self.tail_rows,
                num_segments=n)
        return d

    def row_l1_norms(self) -> jnp.ndarray:
        """Σ_j |a_ij| per row — the l1-Jacobi scaling vector."""
        y = jnp.sum(jnp.abs(self.vals), axis=1)
        if self.has_tail:
            y = y + jax.ops.segment_sum(
                jnp.abs(self.tail_vals), self.tail_rows,
                num_segments=self.shape[0])
        return y

    def to_csr(self) -> sp.csr_matrix:
        """Host round-trip (diagnostics / dumps)."""
        cols = np.asarray(self.cols)
        vals = np.asarray(self.vals)
        n, k = cols.shape
        rows = np.repeat(np.arange(n), k)
        mask = vals.ravel() != 0.0
        # keep explicit stored zeros on the diagonal? ELL pads with zeros at
        # col 0 — filter pads only (val==0 AND beyond row nnz is ambiguous;
        # acceptable for diagnostics).
        r, c, v = rows[mask], cols.ravel()[mask], vals.ravel()[mask]
        if self.has_tail:
            tm = np.asarray(self.tail_vals) != 0.0
            r = np.concatenate([r, np.asarray(self.tail_rows)[tm]])
            c = np.concatenate([c, np.asarray(self.tail_cols)[tm]])
            v = np.concatenate([v, np.asarray(self.tail_vals)[tm]])
        A = sp.coo_matrix((v, (r, c)), shape=self.shape).tocsr()
        A.sum_duplicates()
        A.sort_indices()
        return A


def from_csr(A: sp.csr_matrix, dtype=jnp.float64, **kw) -> EllMatrix:
    return EllMatrix.from_csr(A, dtype=dtype, **kw)
