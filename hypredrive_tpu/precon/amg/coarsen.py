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
    try:
        from ...io.native import amg_pmis

        nat = amg_pmis(S.indptr, S.indices, seed, measure_boost)
    except Exception:
        nat = None
    if nat is not None:
        return nat
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

    # edge lists materialized ONCE; each round filters its active subset
    # (the sets shrink geometrically, so total work is ~2-3x nnz instead
    # of rounds x nnz)
    g_rows = np.repeat(np.arange(n), np.diff(G.indptr))
    g_cols = G.indices
    s_rows = np.repeat(np.arange(n), np.diff(S.indptr))
    s_cols = S.indices
    g_active = np.flatnonzero((state[g_rows] == UNDECIDED)
                              & (state[g_cols] == UNDECIDED))
    s_active = np.flatnonzero(state[s_rows] == UNDECIDED)

    while (state == UNDECIDED).any():
        r, c = g_rows[g_active], g_cols[g_active]
        lose = np.zeros(n, dtype=bool)
        bad = w[r] <= w[c]
        lose[r[bad]] = True
        new_c = (state == UNDECIDED) & ~lose
        if not new_c.any():
            # numerical tie stalemate cannot happen with distinct hashes,
            # but guard anyway: promote the max-w undecided point
            undecided = np.flatnonzero(state == UNDECIDED)
            new_c = np.zeros(n, dtype=bool)
            new_c[undecided[np.argmax(w[undecided])]] = True
        state[new_c] = C
        # any undecided point strongly depending on a new C becomes F
        sr, sc = s_rows[s_active], s_cols[s_active]
        dep = (state[sr] == UNDECIDED) & (state[sc] == C)
        state[sr[dep]] = F
        # shrink the active edge sets
        g_active = g_active[(state[r] == UNDECIDED)
                            & (state[c] == UNDECIDED)]
        s_active = s_active[state[sr] == UNDECIDED]

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


def ruge_stuben(S: sp.csr_matrix) -> np.ndarray:
    """Classical Ruge-Stüben first-pass coarsening (ref vocab rs=1,
    rs3=3; hypre's serial host algorithm).  Setup runs on host anyway
    (the framework's latency/throughput split), so the sequential pass
    is admissible when explicitly requested.

    measure(i) = #points i strongly influences; repeatedly promote the
    max-measure point to C, make its dependents F, and bump the measure
    of points those dependents still depend on (classical update)."""
    import heapq

    n = S.shape[0]
    ST = S.T.tocsr()
    w = np.diff(ST.indptr).astype(np.int64).copy()
    state = np.zeros(n, dtype=np.int8)  # 0 undecided, 1 C, -1 F

    # isolated points (no strong connections either way): F
    iso = (np.diff(S.indptr) == 0) & (np.diff(ST.indptr) == 0)
    state[iso] = -1

    heap = [(-w[i], i) for i in np.flatnonzero(state == 0)]
    heapq.heapify(heap)
    while heap:
        neg_wi, i = heapq.heappop(heap)
        if state[i] != 0 or -neg_wi != w[i]:
            continue  # stale heap entry (lazy deletion)
        state[i] = 1  # C-point
        # dependents of i become F; their dependencies gain measure
        for j in ST.indices[ST.indptr[i]:ST.indptr[i + 1]]:
            if state[j] != 0:
                continue
            state[j] = -1
            for k in S.indices[S.indptr[j]:S.indptr[j + 1]]:
                if state[k] == 0:
                    w[k] += 1
                    heapq.heappush(heap, (-w[k], k))
        # i's own dependencies lose one potential dependent
        for j in S.indices[S.indptr[i]:S.indptr[i + 1]]:
            if state[j] == 0:
                w[j] -= 1
                heapq.heappush(heap, (-w[j], j))
    state[state == 0] = -1
    return state


def coarsen(S: sp.csr_matrix, ctype: int = 8, seed: int = 0) -> np.ndarray:
    """Dispatch on the coarsening.type code (ref vocab: cljp=0, rs=1,
    rs3=3, falgout=6, pmis=8, hmis=10).  rs/rs3/falgout run the classical
    Ruge-Stüben host pass (falgout = RS followed by PMIS on the boundary
    in hypre; the RS pass is the dominant behavior); cljp maps to PMIS
    (same parallel independent-set family); hmis = PMIS with the RS
    measure boost."""
    if ctype == 10:
        return hmis(S, seed)
    if ctype in (1, 3, 6):
        return ruge_stuben(S)
    return pmis(S, seed)
