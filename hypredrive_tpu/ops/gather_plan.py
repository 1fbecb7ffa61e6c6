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
    sub: np.ndarray         # (NP, 8, 128) int8 — local sublane in window
    lane: np.ndarray        # (NP, 8, 128) int8 — local lane in window
                            # (int8 staging halves host->device transfer;
                            # widened to int32 on device)
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
                          np.zeros(0, np.int32), z.astype(np.int8),
                          z.astype(np.int8), z.astype(vals.dtype),
                          n_rows, n_cols, n_row_tiles, x_sublanes)

    try:
        from ..io.native import build_gather_plan as _native_plan

        nat = _native_plan(rows, cols, vals, n_rows, n_cols)
    except Exception:
        nat = None
    if nat is not None:
        pt, q0, pf, sub, lane, val = _ensure_all_tiles(
            *nat, n_row_tiles=n_row_tiles)
        return GatherPlan(pt, q0, pf, sub, lane, val,
                          n_rows, n_cols, n_row_tiles, x_sublanes)

    tile = rows // TILE_ROWS
    win = cols // WIN                      # aligned window id
    # ONE sort by (tile, window, row); everything else is O(n)
    # run-length arithmetic (this is the setup hot path — ~half of the
    # AMG setup time goes through here)
    key = (tile * (1 << 40) + win * (1 << 20) + (rows % TILE_ROWS))
    order = np.argsort(key, kind="stable")
    key = key[order]
    tile, win = tile[order], win[order]
    r_s, c_s, v_s = rows[order], cols[order], vals[order]
    N = len(key)

    # slot = position within equal (tile, win, row) runs
    new_run = np.empty(N, bool)
    new_run[0] = True
    np.not_equal(key[1:], key[:-1], out=new_run[1:])
    idx = np.arange(N)
    run_start = np.maximum.accumulate(np.where(new_run, idx, 0))
    slot = idx - run_start

    # (tile, win) groups; per-group pass count = max slot + 1
    twkey = key >> 20
    new_tw = np.empty(N, bool)
    new_tw[0] = True
    np.not_equal(twkey[1:], twkey[:-1], out=new_tw[1:])
    tw_starts = np.flatnonzero(new_tw)
    kmax = np.maximum.reduceat(slot, tw_starts) + 1
    base = np.zeros(len(tw_starts) + 1, np.int64)
    np.cumsum(kmax, out=base[1:])
    NP = int(base[-1])
    tw_of_entry = np.cumsum(new_tw) - 1
    pass_of_entry = base[tw_of_entry] + slot

    p_tile = tile[tw_starts].repeat(kmax).astype(np.int32)
    p_win_grp = win[tw_starts]
    p_win = p_win_grp.repeat(kmax).astype(np.int64)

    sub = np.zeros((NP, 8, 128), np.int8)
    lane = np.zeros((NP, 8, 128), np.int8)
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

    p_tile, pass_q0, first, sub, lane, val = _ensure_all_tiles(
        p_tile, pass_q0, first, sub, lane, val, n_row_tiles)
    return GatherPlan(p_tile, pass_q0, first, sub, lane, val,
                      n_rows, n_cols, n_row_tiles, x_sublanes)


def plan_stats(plan: GatherPlan) -> Tuple[int, float]:
    """(num_passes, fill fraction of pass tiles)."""
    nnz = int((plan.val != 0).sum())
    tot = plan.num_passes * TILE_ROWS
    return plan.num_passes, (nnz / tot if tot else 1.0)


def pad_plan(plan: GatherPlan, np_pad: int) -> GatherPlan:
    """Pad a plan to exactly ``np_pad`` passes with no-op passes that
    REPEAT THE LAST TILE (first=0, val=0 → y_ref[last tile] += 0).

    Repeating the last tile keeps the pass→output-tile sequence
    contiguous — revisiting an earlier tile after leaving it breaks the
    kernel's accumulate-in-place contract.

    Shape-stability device: sequences whose per-system plans vary
    slightly in pass count land on the same padded shape, so one
    compiled SpMV serves the whole sequence (pairs with lsseq pattern
    dedup and bucketed hierarchy sizes)."""
    NP = plan.num_passes
    if np_pad <= NP or NP == 0:
        return plan

    def padded(a, fill):
        out = np.full((np_pad,) + a.shape[1:], fill, dtype=a.dtype)
        out[:NP] = a
        return out

    last_tile = int(plan.pass_tile[NP - 1])
    return GatherPlan(
        padded(plan.pass_tile, last_tile), padded(plan.pass_q0, 0),
        padded(plan.pass_first, 0),
        padded(plan.sub, 0), padded(plan.lane, 0), padded(plan.val, 0),
        plan.n_rows, plan.n_cols, plan.n_row_tiles, plan.x_sublanes)


def _ensure_all_tiles(pt, q0, pf, sub, lane, val, n_row_tiles):
    """Inject an explicit zeroing pass for every output tile that has no
    entries — the kernel only zero-initializes a tile on its 'first'
    pass, so a tile with no passes would return uninitialized memory."""
    present = np.unique(pt)
    missing = np.setdiff1d(np.arange(n_row_tiles, dtype=pt.dtype), present)
    if len(missing) == 0:
        return pt, q0, pf, sub, lane, val
    pt2 = np.concatenate([pt, missing])
    order = np.argsort(pt2, kind="stable")
    z1 = np.zeros(len(missing), q0.dtype)
    zt = np.zeros((len(missing), 8, 128), sub.dtype)
    zv = np.zeros((len(missing), 8, 128), val.dtype)
    pt2 = pt2[order]
    q02 = np.concatenate([q0, z1])[order]
    sub2 = np.concatenate([sub, zt])[order]
    lane2 = np.concatenate([lane, zt])[order]
    val2 = np.concatenate([val, zv])[order]
    pf2 = np.ones(len(pt2), pf.dtype)
    pf2[1:] = (pt2[1:] != pt2[:-1]).astype(pf.dtype)
    return pt2, q02, pf2, sub2, lane2, val2
