"""Host-side planner for the Pallas gather-SpMV kernel.

TPU context (see /opt/skills/guides/pallas_guide.md): XLA's generic
gather runs on the scalar core at ~0.14 G idx/s — 200x slower than VPU
streaming — which makes unstructured SpMV (AMG coarse operators,
interpolation) the bottleneck of the whole V-cycle.  Mosaic does expose
a fast *lane* gather (``take_along_axis(op, idx, axis=1)`` on (8, 128)
tiles).  This planner restructures an arbitrary COO matrix so the kernel
(ops/pallas_spmv.py) needs exactly ONE of those per pass:

* output rows are tiled 1024 at a time, mapped to an (8, 128) tile as
  row r -> (sublane (r % 1024)//128, lane r % 128);
* each entry's column c lives in x-sublane s = c//128 at lane c%128
  (x is stored (S, 128) in VMEM);
* a *pass* gives every OUTPUT sublane i its own x-sublane choice
  q0[p, i]: the kernel assembles an (8, 128) window whose row i is
  x[q0[p, i], :], lane-gathers it against the per-entry lane indices,
  multiplies by the value tile and accumulates.  One gather, one FMA —
  no broadcast/select loop.
* entries of output block (tile, i) are grouped by (x-sublane s,
  occurrence k within the (row, s) pair); each such *subgroup* holds at
  most one entry per output row, so it occupies one pass slot.  Pass
  count per tile = max over its 8 blocks of the block's subgroup count
  (no bin packing, no cross-row conflicts by construction).

Wire format: the plan stores its entries PACKED — per entry a flat
``slot = pass*1024 + sublane*128 + lanepos`` (int32, sorted), the
x-lane ``elane`` (int8) and the coefficient ``evals`` — ~9 B/nnz
instead of dense (NP, 8, 128) tiles.  The dense lane/val tiles the
kernel consumes are assembled ON DEVICE by one sorted scatter
(ops/pallas_spmv.py), so a remote-TPU tunnel ships megabytes, not the
mostly-zero pass tiles.  Dense host tiles remain available as lazy
properties for the XLA fallback and tests.

The plan is fully static per sparsity pattern (pairs with lsseq pattern
dedup: one compile per pattern).  Reference counterpart: the CSR SpMV
inside hypre (hypre_CSRMatrixMatvec) — re-imagined for the TPU memory
model instead of ported.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np

TILE_ROWS = 1024          # output rows per tile: 8 sublanes x 128 lanes
GROUP_MAX = 256           # max passes fused into one kernel grid step
                          # (VMEM: 2 double-buffered (G, 8, 128) blocks
                          # = G * 10 KB)
# grouping cost model, slope-measured on v5e (round 5): streaming one
# pass's dense val+lane tile ~7.5 ns, fixed per-grid-step cost ~290 ns
GROUP_STEP_COST = 39      # per-step cost in pass-stream units


@dataclass
class GatherPlan:
    """Static pass schedule for one sparsity pattern (packed entries)."""

    # scalar-prefetch arrays (SMEM)
    pass_tile: np.ndarray   # (NP,) int32 — output tile index
    pass_first: np.ndarray  # (NP,) int32 — 1 if first pass of its tile
    q0: np.ndarray          # (NP, 8) int32 — x-sublane per output sublane
    # packed entries, sorted by slot (one entry per slot by construction)
    slot: np.ndarray        # (E,) int32 — pass*1024 + sub*128 + lanepos
    elane: np.ndarray       # (E,) int8  — lane within the x-sublane
    evals: np.ndarray       # (E,) float — coefficient
    n_rows: int
    n_cols: int
    n_row_tiles: int
    x_sublanes: int         # padded sublane count of the x operand
    group: int = 1          # passes per kernel grid step; every tile's
                            # pass count is a multiple of this
    _lane_cache: Optional[np.ndarray] = field(
        default=None, repr=False, compare=False)
    _val_cache: Optional[np.ndarray] = field(
        default=None, repr=False, compare=False)

    @property
    def num_passes(self) -> int:
        return len(self.pass_tile)

    @property
    def lane(self) -> np.ndarray:
        """Dense (NP, 8, 128) int8 lane tiles (lazy; fallback/tests)."""
        if self._lane_cache is None:
            lane = np.zeros((self.num_passes, 8, 128), np.int8)
            lane.reshape(-1)[self.slot] = self.elane
            self._lane_cache = lane
        return self._lane_cache

    @property
    def val(self) -> np.ndarray:
        """Dense (NP, 8, 128) value tiles (lazy; fallback/tests)."""
        if self._val_cache is None:
            val = np.zeros((self.num_passes, 8, 128), self.evals.dtype)
            val.reshape(-1)[self.slot] = self.evals
            self._val_cache = val
        return self._val_cache

    def entry_rows_cols(self) -> Tuple[np.ndarray, np.ndarray]:
        """(rows, cols) of the packed entries (host, global indices)."""
        p = self.slot // TILE_ROWS
        within = self.slot % TILE_ROWS
        rows = self.pass_tile[p].astype(np.int64) * TILE_ROWS + within
        cols = (self.q0[p, within // 128].astype(np.int64) * 128
                + self.elane.astype(np.int64))
        return rows, cols


def build_plan(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
               n_rows: int, n_cols: int) -> GatherPlan:
    """Plan a COO matrix (sorted or not) into gather passes."""
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    vals = np.asarray(vals)
    n_row_tiles = max(1, -(-n_rows // TILE_ROWS))
    # x operand padded to whole (8, 128) VMEM tiles
    x_sublanes = max(8, ((-(-n_cols // 128) + 7) // 8) * 8)

    if len(rows) == 0:
        e = np.zeros(0)
        return GatherPlan(np.zeros(0, np.int32), np.zeros(0, np.int32),
                          np.zeros((0, 8), np.int32),
                          e.astype(np.int32), e.astype(np.int8),
                          e.astype(vals.dtype),
                          n_rows, n_cols, n_row_tiles, x_sublanes)

    try:
        from ..io.native import build_gather_plan as _native_plan

        nat = _native_plan(rows, cols, vals, n_rows, n_cols, n_row_tiles)
    except Exception:
        nat = None
    if nat is not None:
        # the native planner already grouped/padded pass counts
        pt, pf, q0, slot, elane, evals, G = nat
        return GatherPlan(pt, pf, q0, slot, elane, evals,
                          n_rows, n_cols, n_row_tiles, x_sublanes, G)

    blk = rows // 128                       # global 128-row output block
    s = cols // 128                         # x-sublane of the column

    # occurrence index k within each (row, s) pair: ONE sort by
    # (row, col); k = position inside the equal-(row, s) run
    o1 = np.lexsort((cols, rows))
    r1, s1 = rows[o1], s[o1]
    c1, v1 = cols[o1], vals[o1]
    blk1 = blk[o1]
    N = len(r1)
    rs_key = r1 * np.int64(x_sublanes) + s1
    new_rs = np.empty(N, bool)
    new_rs[0] = True
    np.not_equal(rs_key[1:], rs_key[:-1], out=new_rs[1:])
    idx = np.arange(N)
    k1 = idx - np.maximum.accumulate(np.where(new_rs, idx, 0))

    # subgroup = (block, s, k); sort entries by subgroup (k < 256 when
    # duplicates were summed — guard the rare unsummed-COO case)
    if int(k1.max()) < 256 and x_sublanes <= (1 << 24):
        sg_key = (blk1 << np.int64(32)) | (s1 << np.int64(8)) | k1
        o2 = np.argsort(sg_key, kind="stable")
        sg2 = sg_key[o2]
    else:
        o2 = np.lexsort((k1, s1, blk1))
        sg2 = None
    blk2, s2 = blk1[o2], s1[o2]
    c2, v2, r2 = c1[o2], v1[o2], r1[o2]

    new_sg = np.empty(N, bool)
    new_sg[0] = True
    if sg2 is not None:
        np.not_equal(sg2[1:], sg2[:-1], out=new_sg[1:])
    else:
        k2 = k1[o2]
        new_sg[1:] = ((blk2[1:] != blk2[:-1]) | (s2[1:] != s2[:-1])
                      | (k2[1:] != k2[:-1]))
    sg_of_entry = np.cumsum(new_sg) - 1
    sg_starts = np.flatnonzero(new_sg)
    sg_blk = blk2[sg_starts]                # block of each subgroup
    sg_s = s2[sg_starts].astype(np.int32)   # x-sublane of each subgroup

    # rank j of the subgroup within its block
    n_sg = len(sg_starts)
    sg_idx = np.arange(n_sg)
    new_blk = np.empty(n_sg, bool)
    new_blk[0] = True
    np.not_equal(sg_blk[1:], sg_blk[:-1], out=new_blk[1:])
    j = sg_idx - np.maximum.accumulate(np.where(new_blk, sg_idx, 0))

    # passes per tile = max (j+1) over the tile's blocks (>= 1 so every
    # tile gets a zero-init pass even with no entries)
    sg_tile = (sg_blk // 8).astype(np.int64)
    npass_tile = np.ones(n_row_tiles, np.int64)
    np.maximum.at(npass_tile, sg_tile, j + 1)
    base = np.zeros(n_row_tiles + 1, np.int64)
    np.cumsum(npass_tile, out=base[1:])
    NP = int(base[-1])

    pass_of_sg = base[sg_tile] + j
    pass_of_entry = pass_of_sg[sg_of_entry]

    q0 = np.zeros((NP, 8), np.int32)
    q0[pass_of_sg, sg_blk % 8] = sg_s
    i8 = (r2 // 128) % 8
    l_idx = r2 % 128
    slot = (pass_of_entry * TILE_ROWS + i8 * 128 + l_idx)
    elane = (c2 % 128).astype(np.int8)
    order = np.argsort(slot, kind="stable")
    slot = slot[order].astype(np.int32)
    elane = elane[order]
    evals = v2[order]

    pass_tile = np.repeat(np.arange(n_row_tiles, dtype=np.int32),
                          npass_tile)
    pass_first = np.zeros(NP, np.int32)
    pass_first[base[:-1]] = 1
    arrs, G = _group_plan(pass_tile, pass_first, q0, slot, elane, evals,
                          n_row_tiles=n_row_tiles)
    return GatherPlan(*arrs, n_rows, n_cols, n_row_tiles, x_sublanes, G)


def pick_group(counts) -> int:
    """Choose the kernel group size G from the per-tile pass counts by
    minimizing  padded_passes * stream_cost + grid_steps * step_cost.

    Round-4 shipped an avg/3 power-of-two heuristic (G=16 on the 64³
    L1 operator); slope-timed on the chip the per-step fixed cost
    (~290 ns) dominates far beyond that — one grid step per tile
    (G = max tile count, 100 here) ran the same operator 2x faster even
    with the padding inflation.  The cost model picks that point (or a
    k-steps-per-tile split when the max count exceeds GROUP_MAX)."""
    counts = np.asarray(counts, np.int64)
    maxc = int(counts.max(initial=1))
    cands = {16, 32, 64, 128, GROUP_MAX}
    for k in (1, 2, 3, 4):
        cands.add(-(-maxc // k))
    best_cost, best_g = None, 1
    for G in sorted(c for c in cands if 1 <= c <= GROUP_MAX):
        padded = (-(-counts // G) * G)
        np_g = int(padded.sum())
        cost = np_g + (np_g // G) * GROUP_STEP_COST
        if best_cost is None or cost < best_cost:
            best_cost, best_g = cost, G
    return best_g


def _group_plan(pt, pf, q0, slot, elane, evals, n_row_tiles):
    """Pick the kernel group size G (passes fused per grid step) via
    ``pick_group`` and pad every tile's pass count to a multiple of
    it."""
    NP = len(pt)
    tiles, counts = np.unique(pt, return_counts=True)
    G = pick_group(counts) if NP else 1
    if G <= 1:
        return (pt, pf, q0, slot, elane, evals), 1
    newc = -(-counts // G) * G
    NP2 = int(newc.sum())
    if NP2 == NP:
        return (pt, pf, q0, slot, elane, evals), G
    off_new = np.zeros(len(tiles) + 1, np.int64)
    np.cumsum(newc, out=off_new[1:])
    off_old = np.zeros(len(tiles) + 1, np.int64)
    np.cumsum(counts, out=off_old[1:])
    tidx = np.repeat(np.arange(len(tiles)), counts)
    pos_new = off_new[tidx] + (np.arange(NP) - off_old[tidx])
    pt2 = np.repeat(tiles, newc).astype(pt.dtype)
    pf2 = np.zeros(NP2, pf.dtype)
    pf2[off_new[:-1]] = 1
    q02 = np.zeros((NP2, 8), q0.dtype)
    q02[pos_new] = q0
    # remap entry slots through the pass relocation (order preserved:
    # pos_new is monotone in the old pass index)
    ep = slot // TILE_ROWS
    slot2 = (pos_new[ep] * TILE_ROWS + slot % TILE_ROWS).astype(np.int32)
    return (pt2, pf2, q02, slot2, elane, evals), G


def plan_stats(plan: GatherPlan) -> Tuple[int, float]:
    """(num_passes, fill fraction of pass tiles)."""
    nnz = int((plan.evals != 0).sum())
    tot = plan.num_passes * TILE_ROWS
    return plan.num_passes, (nnz / tot if tot else 1.0)


def plan_nbytes(plan: GatherPlan) -> int:
    """Host->device wire bytes of the packed plan."""
    return (plan.q0.nbytes + plan.slot.nbytes + plan.elane.nbytes
            + plan.evals.nbytes + plan.pass_tile.nbytes
            + plan.pass_first.nbytes)


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
    # keep every tile's pass count a multiple of the kernel group size
    np_pad = -(-np_pad // plan.group) * plan.group

    def padded(a, fill):
        out = np.full((np_pad,) + a.shape[1:], fill, dtype=a.dtype)
        out[:NP] = a
        return out

    last_tile = int(plan.pass_tile[NP - 1])
    return GatherPlan(
        padded(plan.pass_tile, last_tile), padded(plan.pass_first, 0),
        padded(plan.q0, 0),
        plan.slot, plan.elane, plan.evals,
        plan.n_rows, plan.n_cols, plan.n_row_tiles, plan.x_sublanes,
        plan.group)
