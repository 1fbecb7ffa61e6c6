"""Parallel coarsening: PMIS / HMIS (+ fallbacks).

Reference behavior: BoomerAMG coarsening types (ref: amg.c:303-309
cljp|rs|rs3|falgout|pmis|hmis).  PMIS (Parallel Modified Independent Set,
De Sterck-Yang-Heys) is the device-friendly default; it is deterministic
here via a hash-based tiebreak on the *global* row index, so the C/F
split is independent of partitioning (the property the reference gets
from hypre's deterministic RNG seeds).

HMIS runs one pass of Ruge-Stüben first-pass on the host (serial per
shard in the reference; here global) and PMIS on the remainder — we
implement it as PMIS on the 2-stage measure, which reproduces its
"aggressive-but-safe" coarsening rate.

Returns cf_marker: +1 for C-points, -1 for F-points.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def _hash_random(n: int, seed: int = 0) -> np.ndarray:
    """Deterministic per-index uniform(0,1) via splitmix64 hashing —
    partition-independent tiebreak."""
    idx = np.arange(n, dtype=np.uint64) + np.uint64(
        (seed * 0x9E3779B97F4A7C15) % (1 << 64))
    z = idx + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    return (z >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def pmis(S: sp.csr_matrix, seed: int = 0,
         measure_boost: np.ndarray | None = None) -> np.ndarray:
    """PMIS C/F splitting on strength graph S (S[i,j]: i depends on j)."""
    n = S.shape[0]
    ST = S.T.tocsr()  # ST[j,i]: j influences i → row j lists dependents

    # measure = number of points this point strongly influences + rand
    influence = np.diff(ST.indptr).astype(np.float64)
    if measure_boost is not None:
        influence = influence + measure_boost
    w = influence + _hash_random(n, seed)

    # undirected adjacency for the independent-set comparisons
    G = (S + ST).tocsr()

    UNDECIDED, C, F = 0, 1, -1
    state = np.zeros(n, dtype=np.int8)

    # points with no strong connections at all: F immediately (they don't
    # need coarse correction — nothing strongly influences them)
    iso = (np.diff(S.indptr) == 0) & (np.diff(ST.indptr) == 0)
    state[iso] = F
    # points that influence nobody and have measure < 1: F (hypre PMIS)
    state[(influence == 0) & ~iso] = F

    indptr, indices = G.indptr, G.indices
    while True:
        undecided = np.flatnonzero(state == UNDECIDED)
        if len(undecided) == 0:
            break
        # neighbor max over undecided neighbors
        wu = np.where(state == UNDECIDED, w, -1.0)
        # For each undecided i: is w[i] > w[j] for all undecided neighbors?
        sel = np.ones(n, dtype=bool)
        rows = np.repeat(np.arange(n), np.diff(indptr))
        mask_u = (state[rows] == UNDECIDED)
        nb_mask = mask_u & (state[indices] == UNDECIDED)
        r, c = rows[nb_mask], indices[nb_mask]
        bad = w[r] <= w[c]
        lose = np.zeros(n, dtype=bool)
        np.logical_or.at(lose, r[bad], True)
        new_c = (state == UNDECIDED) & ~lose
        if not new_c.any():
            # numerical tie stalemate cannot happen with distinct hashes,
            # but guard anyway: promote the max-w undecided point
            new_c = np.zeros(n, dtype=bool)
            new_c[undecided[np.argmax(w[undecided])]] = True
        state[new_c] = C
        # any undecided point strongly depending on a new C becomes F
        dep_rows = np.repeat(np.arange(n), np.diff(S.indptr))
        dep_mask = (state[dep_rows] == UNDECIDED) & (state[S.indices] == C)
        state[np.unique(dep_rows[dep_mask])] = F

    return state.astype(np.int8)


def hmis(S: sp.csr_matrix, seed: int = 0) -> np.ndarray:
    """HMIS: PMIS with a Ruge-Stüben-style first-pass measure boost.

    The serial RS first pass favors points that influence many F-points;
    we emulate the hybrid by boosting the PMIS measure with the RS
    second-round weights, yielding HMIS-like (sparser) grids.
    """
    ST = S.T.tocsr()
    influence = np.diff(ST.indptr).astype(np.float64)
    # one Jacobi-like smoothing of the influence measure over the graph
    boost = np.zeros_like(influence)
    if S.nnz:
        boost = np.asarray(ST @ (influence > np.median(influence)),
                           dtype=np.float64).ravel() * 0.5
    return pmis(S, seed=seed, measure_boost=boost)


def coarsen(S: sp.csr_matrix, ctype: int = 8, seed: int = 0) -> np.ndarray:
    """Dispatch on the coarsening.type code (ref vocab: cljp=0, rs=1,
    rs3=3, falgout=6, pmis=8, hmis=10).  Non-PMIS variants are sequential
    host algorithms in hypre; on TPU all map to the PMIS family (PMIS for
    cljp/rs/falgout, HMIS boost for hmis), which preserves the intent
    (grid sparsity) without the sequential dependency."""
    if ctype == 10:
        return hmis(S, seed)
    return pmis(S, seed)
