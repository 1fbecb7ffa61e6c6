"""Row-sharded ELL matrix with shard_map SpMV + ppermute halo exchange.

The distributed twin of :class:`~hypredrive_tpu.ops.device_matrix.
EllMatrix`: rows are block-partitioned over a 1-D mesh (the reference's
ParCSR decomposition, ref: SURVEY §2.9); each shard stores a padded local
ELL block whose column indices address the extended local vector
``[x_local | halos]`` filled by the static ppermute schedule from
:mod:`.halo`.

Global-view semantics: vectors are ordinary jax Arrays sharded with
``NamedSharding(mesh, P('rows'))`` (padded to equal shard sizes with
identity rows), so the *same* Krylov solver code runs single-chip and
multi-chip — XLA inserts psum for the dot products, and the matvec is
this class's shard_mapped kernel.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.csr import row_partition
from .mesh import ROWS_AXIS
from .halo import build_halo_plan


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_pytree_node_class
@dataclass
class DistEllMatrix:
    """Row-sharded sparse matrix (square or rectangular).

    cols/vals: (n_shards·rows_max, K) sharded on axis 0 — column indices
               address x_ext positions
    send_idx:  per offset: (n_shards, S_d) sharded on axis 0
    mesh/offsets/shapes: static aux
    """

    cols: jnp.ndarray
    vals: jnp.ndarray
    send_idx: Tuple[jnp.ndarray, ...]
    mesh: Mesh
    offsets: Tuple[int, ...]         # ppermute shard distances (static)
    shape: Tuple[int, int]           # padded global shape
    orig_shape: Tuple[int, int]      # before padding
    nnz: int
    local_max: int                   # padded col-shard size (x_ext locals)
    ext_size: int

    def tree_flatten(self):
        return ((self.cols, self.vals, self.send_idx),
                (self.mesh, self.offsets, self.shape, self.orig_shape,
                 self.nnz, self.local_max, self.ext_size))

    @classmethod
    def tree_unflatten(cls, aux, children):
        cols, vals, send_idx = children
        return cls(cols, vals, send_idx, *aux)

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def n_shards(self) -> int:
        return self.mesh.devices.size

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------

    @classmethod
    def from_csr(cls, A: sp.csr_matrix, mesh: Mesh, dtype=jnp.float64,
                 pad_identity: bool = True) -> "DistEllMatrix":
        """Partition a host CSR matrix over the mesh rows axis.

        Square matrices are padded with identity rows/cols to a multiple
        of n_shards (padded entries stay exactly zero through solves:
        b_pad = 0, x0_pad = 0 ⇒ r_pad ≡ 0).  Rectangular operators (P/R)
        pad rows and columns independently.
        """
        A = sp.csr_matrix(A)
        n_shards = int(mesh.devices.size)
        n_rows, n_cols = A.shape
        rows_pad = _round_up(n_rows, n_shards)
        cols_pad = _round_up(n_cols, n_shards)
        square = n_rows == n_cols

        if rows_pad != n_rows or cols_pad != n_cols:
            A = A.copy()
            A.resize((rows_pad, cols_pad))
            if square and pad_identity:
                extra = np.arange(n_rows, rows_pad)
                A = (A + sp.coo_matrix(
                    (np.ones(len(extra)), (extra, extra)),
                    shape=(rows_pad, cols_pad))).tocsr()
        A.sort_indices()

        row_off = row_partition(rows_pad, n_shards)
        col_off = row_partition(cols_pad, n_shards)
        rows_max = int((row_off[1:] - row_off[:-1]).max())

        # per-shard needed columns
        needed = []
        for s in range(n_shards):
            lo, hi = int(row_off[s]), int(row_off[s + 1])
            sub = A[lo:hi]
            needed.append(np.unique(sub.indices))
        plan, recv_pos = build_halo_plan(n_shards, col_off, needed)

        # per-shard ELL with remapped columns
        k = max(1, int(np.diff(A.indptr).max(initial=0)))
        all_cols = np.zeros((n_shards, rows_max, k), dtype=np.int32)
        all_vals = np.zeros((n_shards, rows_max, k), dtype=np.float64)
        for s in range(n_shards):
            lo, hi = int(row_off[s]), int(row_off[s + 1])
            sub = sp.csr_matrix(A[lo:hi])
            sub.sort_indices()
            nr = hi - lo
            row_nnz = np.diff(sub.indptr)
            rws = np.repeat(np.arange(nr), row_nnz)
            pos = np.arange(sub.nnz) - np.repeat(sub.indptr[:-1], row_nnz)
            # remap global cols to x_ext positions
            g = sub.indices.astype(np.int64)
            local = (g >= col_off[s]) & (g < col_off[s + 1])
            mapped = np.empty(len(g), dtype=np.int64)
            mapped[local] = g[local] - col_off[s]
            if (~local).any():
                rp = recv_pos[s]
                mapped[~local] = np.array([rp[int(c)] for c in g[~local]],
                                          dtype=np.int64)
            all_cols[s, rws, pos] = mapped
            all_vals[s, rws, pos] = sub.data

        rows_sh = NamedSharding(mesh, P(ROWS_AXIS))
        cols_dev = jax.device_put(
            all_cols.reshape(n_shards * rows_max, k), rows_sh)
        vals_dev = jax.device_put(
            all_vals.reshape(n_shards * rows_max, k).astype(dtype), rows_sh)
        send_dev = tuple(
            jax.device_put(idx, rows_sh) for idx in plan.send_idx)

        return cls(
            cols=cols_dev, vals=vals_dev, send_idx=send_dev, mesh=mesh,
            offsets=plan.offsets, shape=(rows_pad, cols_pad),
            orig_shape=(n_rows, n_cols), nnz=int(A.nnz),
            local_max=plan.local_max, ext_size=plan.ext_size)

    # ------------------------------------------------------------------
    # kernels
    # ------------------------------------------------------------------

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """y = A @ x, x sharded P('rows') with length shape[1]."""
        n_sh = self.n_shards
        rows_max = self.shape[0] // n_sh
        local_cols = self.shape[1] // n_sh
        perm = [tuple(((i, (i + d) % n_sh) for i in range(n_sh)))
                for d in self.offsets]
        offsets = self.offsets
        local_max = self.local_max
        ext_size = self.ext_size

        def kernel(cols, vals, x_loc, *send_idx):
            # x_loc: (local_cols,) this shard's slice
            parts = [x_loc]
            if local_max > local_cols:
                parts.append(jnp.zeros(local_max - local_cols, x_loc.dtype))
            for k, d in enumerate(offsets):
                buf = x_loc[send_idx[k][0]]          # (S_d,)
                recv = jax.lax.ppermute(buf, ROWS_AXIS, perm[k])
                parts.append(recv)
            x_ext = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
            y = jnp.einsum("rk,rk->r", vals, x_ext[cols])
            return y

        in_specs = ((P(ROWS_AXIS, None), P(ROWS_AXIS, None), P(ROWS_AXIS))
                    + tuple(P(ROWS_AXIS, None) for _ in offsets))
        f = shard_map(kernel, mesh=self.mesh, in_specs=in_specs,
                      out_specs=P(ROWS_AXIS))
        return f(self.cols, self.vals, x, *self.send_idx)

    def diagonal(self) -> jnp.ndarray:
        """diag(A) for square matrices (x_ext position of the diagonal in
        row r of shard s is the local position r)."""
        n_sh = self.n_shards
        rows_max = self.shape[0] // n_sh

        def kernel(cols, vals):
            r = jnp.arange(rows_max, dtype=cols.dtype)[:, None]
            return jnp.sum(jnp.where(cols == r, vals, 0.0), axis=1)

        f = shard_map(kernel, mesh=self.mesh,
                      in_specs=(P(ROWS_AXIS, None), P(ROWS_AXIS, None)),
                      out_specs=P(ROWS_AXIS))
        return f(self.cols, self.vals)

    def row_l1_norms(self) -> jnp.ndarray:
        return jnp.sum(jnp.abs(self.vals), axis=1)


def pad_vector(v: np.ndarray, n_pad: int, mesh: Mesh, dtype=jnp.float64):
    """Host vector → padded, row-sharded device array."""
    out = np.zeros(n_pad, dtype=np.float64)
    out[:len(v)] = np.asarray(v)
    return jax.device_put(jnp.asarray(out, dtype=dtype),
                          NamedSharding(mesh, P(ROWS_AXIS)))
