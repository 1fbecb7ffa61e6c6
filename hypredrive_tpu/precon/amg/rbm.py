"""Interpolation-vector (rigid-body-mode) augmentation.

Elasticity AMG needs the rotational near-null-space modes represented in
range(P) — plain distance-based interpolation only reproduces constants.
The reference wires RBMs through hypre's GM variants
(ref: src/internal/amg.c:602 hypredrv_AMGSetRBMs,
HYPRE_BoomerAMGSetInterpVectors / SetInterpVecVariant, used by the
elasticity example with 6 modes).

TPU-first construction: instead of hypre's per-row C loops, each F-row
of P gets the **minimum-norm weight correction** that makes it exactly
interpolate the coarse-restricted modes within its existing sparsity
pattern:

    Δw_i = V_J (V_Jᵀ V_J)⁺ (v_i − V_Jᵀ w_i)

batched over rows with equal stencil size (one vectorized pinv/matmul
per group).  The minimal-Δw choice preserves the diffusion accuracy of
the base interpolation; with |J| < #modes the correction enforces the
best-fit projection (hypre's QMax truncation has the same effect).
Coarse-level vectors are the C-point injection, as hypre does.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import scipy.sparse as sp


def augment_interpolation(P: sp.csr_matrix, cf: np.ndarray,
                          V: np.ndarray, rcond: float = 1e-10
                          ) -> Tuple[sp.csr_matrix, np.ndarray]:
    """Return (P', V_coarse): P' exactly (or best-fit) interpolates V.

    P: (n, nC) with identity C rows; cf: PMIS marks (>0 C, <0 F);
    V: (n, k) near-null-space vectors (columns = modes).
    """
    V = np.atleast_2d(np.asarray(V, dtype=np.float64))
    if V.shape[0] != P.shape[0]:
        V = V.T
    n, k = V.shape
    C = np.flatnonzero(cf > 0)
    F = np.flatnonzero(cf < 0)
    Vc = V[C]  # coarse modes by injection

    P = P.tocsr().copy()
    P.sort_indices()
    indptr, indices, data = P.indptr, P.indices, P.data

    counts = np.diff(indptr)
    # F rows only (C rows are identity and already exact)
    f_rows = F[counts[F] > 0]
    f_counts = counts[f_rows]

    for m in np.unique(f_counts):
        grp = f_rows[f_counts == m]
        starts = indptr[grp]
        idx = starts[:, None] + np.arange(m)[None, :]   # (g, m) nnz slots
        J = indices[idx]                                 # coarse col ids
        W = data[idx]                                    # current weights
        VJ = Vc[J]                                       # (g, m, k)
        # residual of the mode-interpolation constraints
        r = V[grp] - np.einsum("gm,gmk->gk", W, VJ)      # (g, k)
        G = np.einsum("gmk,gml->gkl", VJ, VJ)            # (g, k, k) Gram
        Ginv = np.linalg.pinv(G, rcond=rcond)
        dw = np.einsum("gmk,gkl,gl->gm", VJ, Ginv, r)
        data[idx.ravel()] = (W + dw).ravel()

    P_aug = sp.csr_matrix((data, indices, indptr), shape=P.shape)
    return P_aug, Vc
