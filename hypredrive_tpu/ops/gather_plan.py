"""Host-side planner for the Pallas windowed gather-SpMV kernel.

TPU context (see /opt/skills/guides/pallas_guide.md): XLA's generic
gather runs on the scalar core at ~0.14 G idx/s — 200x slower than VPU
streaming — which makes unstructured SpMV (AMG coarse operators,
interpolation) the bottleneck of the whole V-cycle.  Mosaic does expose
a fast *lane* gather (``take_along_axis(op, idx, axis=1)`` on (T, 128)
tiles).  This planner restructures an arbitrary COO matrix so the kernel
(ops/pallas_spmv.py) only ever needs that primitive:

* output rows are tiled 1024 at a time, mapped to an (8, 128) tile as
  row i -> (sublane (i%1024)//128, lane i%128);
* each entry's column is assigned to a 1024-wide aligned *window* of x,
  so its local index splits into (sub = local//128, lane = local%128)
  with sub < 8;
* entries are grouped into *passes*: one pass = one output tile, one
  window base, and at most one entry per output row.  The kernel runs
  one grid step per pass: slice 8 sublanes of x, then for j in 0..7
  broadcast window row j, lane-gather it, and select where sub == j.

The plan is fully static per sparsity pattern (pairs with lsseq pattern
dedup: one compile per pattern).  Reference counterpart: the CSR SpMV
inside hypre (hypre_CSRMatrixMatvec) — re-imagined for the TPU memory
model instead of ported.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np

TILE_ROWS = 1024          # output rows per tile: 8 sublanes x 128 lanes
WIN = 1024                # gather window: 8 sublanes x 128 lanes of x


@dataclass
class GatherPlan:
    """Static pass schedule for one sparsity pattern."""

    # scalar-prefetch arrays, one element per pass (grid step)
    pass_tile: np.ndarray   # (NP,) int32 — output tile index
    pass_q0: np.ndarray     # (NP,) int32 — window start sublane of x
    pass_first: np.ndarray  # (NP,) int32 — 1 if first pass of its tile
    # per-pass dense tiles
    sub: np.ndarray         # (NP, 8, 128) int32 — local sublane in window
    lane: np.ndarray        # (NP, 8, 128) int32 — local lane in window
    val: np.ndarray         # (NP, 8, 128) float — coefficient (0 = hole)
    n_rows: int
    n_cols: int
    n_row_tiles: int
    x_sublanes: int         # padded sublane count of the x operand

    @property
    def num_passes(self) -> int:
        return len(self.pass_tile)


def build_plan(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
               n_rows: int, n_cols: int) -> GatherPlan:
    """Plan a COO matrix (sorted or not) into gather passes."""
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    vals = np.asarray(vals)
    n_row_tiles = max(1, -(-n_rows // TILE_ROWS))
    # x operand sublane count: window slices [q0, q0+8) must stay in
    # bounds, so pad to a multiple of 8 beyond the last real sublane
    x_sub_data = -(-n_cols // 128)
    x_sublanes = ((x_sub_data + 7) // 8 + 1) * 8

    if len(rows) == 0:
        z = np.zeros((0, 8, 128))
        return GatherPlan(np.zeros(0, np.int32), np.zeros(0, np.int32),
                          np.zeros(0, np.int32), z.astype(np.int32),
                          z.astype(np.int32), z.astype(vals.dtype),
                          n_rows, n_cols, n_row_tiles, x_sublanes)

    tile = rows // TILE_ROWS
    win = cols // WIN                      # aligned window id
    # sort entries by (tile, window, row) so same-tile passes are
    # consecutive (required for VMEM output accumulation)
    order = np.lexsort((rows, win, tile))
    tile, win = tile[order], win[order]
    r_s, c_s, v_s = rows[order], cols[order], vals[order]

    # slot index within (tile, window, row): entries hitting the same
    # output row in the same window stack into successive passes
    grp = tile * (1 << 40) + win * (1 << 20) + (r_s % TILE_ROWS)
    _, first_idx, counts = np.unique(grp, return_index=True,
                                     return_counts=True)
    slot = np.arange(len(grp)) - np.repeat(first_idx, counts)

    # pass key: (tile, window, slot)
    pkey = tile * (1 << 40) + win * (1 << 20) + slot
    uniq, pass_of_entry = np.unique(pkey, return_inverse=True)
    NP = len(uniq)
    p_tile = (uniq >> 40).astype(np.int32)
    p_win = ((uniq >> 20) & ((1 << 20) - 1)).astype(np.int64)

    sub = np.zeros((NP, 8, 128), np.int32)
    lane = np.zeros((NP, 8, 128), np.int32)
    val = np.zeros((NP, 8, 128), vals.dtype)

    local_row = (r_s % TILE_ROWS)
    s_idx = local_row // 128
    l_idx = local_row % 128
    c_local = c_s - p_win[pass_of_entry] * WIN
    sub[pass_of_entry, s_idx, l_idx] = c_local // 128
    lane[pass_of_entry, s_idx, l_idx] = c_local % 128
    val[pass_of_entry, s_idx, l_idx] = v_s

    pass_q0 = (p_win * (WIN // 128)).astype(np.int32)
    first = np.ones(NP, np.int32)
    first[1:] = (p_tile[1:] != p_tile[:-1]).astype(np.int32)

    return GatherPlan(p_tile, pass_q0, first, sub, lane, val,
                      n_rows, n_cols, n_row_tiles, x_sublanes)


def plan_stats(plan: GatherPlan) -> Tuple[int, float]:
    """(num_passes, fill fraction of pass tiles)."""
    nnz = int((plan.val != 0).sum())
    tot = plan.num_passes * TILE_ROWS
    return plan.num_passes, (nnz / tot if tot else 1.0)
