"""Pallas gather-SpMV (see ops/gather_plan.py for the plan).

One grid step per pass.  The x operand lives fully in VMEM as
(x_sublanes, 128); each pass assembles an (8, 128) window whose row i is
the x-sublane q0[pass, i] (8 scalar-indexed sublane reads), then runs a
single ``take_along_axis(win, lane, axis=1)`` — the one gather primitive
Mosaic supports everywhere — and one fused multiply-accumulate into the
output tile.  ~10 VPU ops per 1024 potential entries.

Speed: ~2 orders of magnitude over XLA's scalar-core gather for AMG
coarse-operator SpMVs.  Falls back to the XLA segment-sum formulation on
backends without Mosaic (tests run the kernel in interpret mode on CPU
for bit-parity).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .gather_plan import GatherPlan, TILE_ROWS


def _backend_supports_pallas() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


# SMEM budget: scalar-prefetch operands cost 40 B/pass (tile+first+q0);
# plans beyond this are split into multiple pallas calls at tile
# boundaries (SMEM is 1 MB on current TPUs)
CHUNK_PASSES = 16384


def _make_kernel(G):
    def _kernel(tile_ref, first_ref, q0_ref, lane_ref, val_ref,
                x_ref, y_ref):
        from jax.experimental import pallas as pl

        i = pl.program_id(0)

        @pl.when(first_ref[i * G] == 1)
        def _():
            y_ref[...] = jnp.zeros_like(y_ref)

        # one grid step = G passes on the same output tile: assemble the
        # (G*8, 128) window (scalar-indexed sublane reads; q0 is
        # flattened 1-D because 2-D SMEM operands get lane-padded x16),
        # then ONE lane-gather + FMA + G-fold reduce
        win = jnp.concatenate(
            [x_ref[pl.ds(q0_ref[i * 8 * G + j], 1), :]
             for j in range(8 * G)], axis=0)
        lane = lane_ref[...].reshape(G * 8, 128).astype(jnp.int32)
        g = jnp.take_along_axis(win, lane, axis=1)
        prod = (g * val_ref[...].reshape(G * 8, 128)).reshape(G, 8, 128)
        y_ref[...] = y_ref[...] + jnp.sum(prod, axis=0)
    return _kernel


@partial(jax.jit, static_argnums=(0, 6))
def _gather_spmv_call(shape_info, pass_tile, pass_first, q0,
                      lane, val, interpret, x_pad):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_row_tiles, NP, G = shape_info
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(NP // G,),
        in_specs=[
            pl.BlockSpec((G, 8, 128), lambda i, t, f, q: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 8, 128), lambda i, t, f, q: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # x, whole
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i, t, f, q: (t[i * G], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _make_kernel(G),
        out_shape=jax.ShapeDtypeStruct((n_row_tiles * 8, 128), val.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(pass_tile, pass_first, q0, lane, val, x_pad)


def _two_sum(a_hi, a_lo, b_hi, b_lo):
    """Knuth TwoSum of two double-single values (no FMA needed)."""
    s = a_hi + b_hi
    bb = s - a_hi
    err = (a_hi - (s - bb)) + (b_hi - bb)
    lo = err + a_lo + b_lo
    hi = s + lo
    lo = lo - (hi - s)
    return hi, lo


def _split_mul(a, b):
    """Dekker two-product a*b -> (hi, lo) in f32 (Veltkamp splitting;
    exact without FMA)."""
    c = jnp.float32(4097.0)  # 2^12 + 1 for f32 (24-bit mantissa)
    a1 = (a * c) - ((a * c) - a)
    a2 = a - a1
    b1 = (b * c) - ((b * c) - b)
    b2 = b - b1
    p = a * b
    e = ((a1 * b1 - p) + a1 * b2 + a2 * b1) + a2 * b2
    return p, e


def _make_kernel_ds(G):
    """Double-single (split-f32) variant of the gather kernel: values
    and the accumulator are (hi, lo) f32 pairs, products use Dekker
    two-products and sums compensate with TwoSum — f64-quality SpMV on
    a Mosaic that has no 64-bit (the plan's ROADMAP #4 / verdict #9).
    ~20 VPU ops per entry instead of 2; still two orders of magnitude
    over the XLA scalar-gather f64 path."""
    def _kernel(tile_ref, first_ref, q0_ref, lane_ref, vh_ref, vl_ref,
                xh_ref, xl_ref, yh_ref, yl_ref):
        from jax.experimental import pallas as pl

        i = pl.program_id(0)

        @pl.when(first_ref[i * G] == 1)
        def _():
            yh_ref[...] = jnp.zeros_like(yh_ref)
            yl_ref[...] = jnp.zeros_like(yl_ref)

        win_h = jnp.concatenate(
            [xh_ref[pl.ds(q0_ref[i * 8 * G + j], 1), :]
             for j in range(8 * G)], axis=0)
        win_l = jnp.concatenate(
            [xl_ref[pl.ds(q0_ref[i * 8 * G + j], 1), :]
             for j in range(8 * G)], axis=0)
        lane = lane_ref[...].reshape(G * 8, 128).astype(jnp.int32)
        # keep the gather indices int32: under jax_enable_x64 (the f64
        # parity mode that wants this kernel) take_along_axis would
        # promote to int64, which Mosaic cannot lower
        from jax._src import config as _jcfg

        with _jcfg.enable_x64(False):
            gh = jnp.take_along_axis(win_h, lane, axis=1)
            gl = jnp.take_along_axis(win_l, lane, axis=1)
        vh = vh_ref[...].reshape(G * 8, 128)
        vl = vl_ref[...].reshape(G * 8, 128)
        # (vh+vl)·(gh+gl) = Dekker(vh,gh) + vh·gl + vl·gh (+ vl·gl ~ 0)
        p, e = _split_mul(vh, gh)
        e = e + vh * gl + vl * gh
        p = p.reshape(G, 8, 128)
        e = e.reshape(G, 8, 128)
        # compensated fold over the G passes, then into the accumulator
        s_hi, s_lo = yh_ref[...], yl_ref[...]
        for g in range(G):
            s_hi, s_lo = _two_sum(s_hi, s_lo, p[g], e[g])
        yh_ref[...] = s_hi
        yl_ref[...] = s_lo
    return _kernel


@partial(jax.jit, static_argnums=(0, 8))
def _gather_spmv_call_ds(shape_info, pass_tile, pass_first, q0,
                         lane, val_hi, val_lo, x_pair, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x_hi, x_lo = x_pair
    n_row_tiles, NP, G = shape_info
    # trace the kernel body and index maps WITHOUT x64 (all operands are
    # f32/i32 pairs; Mosaic cannot lower the int64 scalars that x64-mode
    # tracing would produce in the grid transforms)
    from jax._src import config as _jcfg

    ctx = _jcfg.enable_x64(False)
    ctx.__enter__()
    try:
        return _gather_spmv_call_ds_inner(
            shape_info, pass_tile, pass_first, q0, lane, val_hi, val_lo,
            x_hi, x_lo, interpret)
    finally:
        ctx.__exit__(None, None, None)


def _gather_spmv_call_ds_inner(shape_info, pass_tile, pass_first, q0,
                               lane, val_hi, val_lo, x_hi, x_lo,
                               interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_row_tiles, NP, G = shape_info
    # index maps are traced at LOWERING time, outside the no-x64 scope
    # above — keep every returned index explicitly int32 or Mosaic sees
    # i64 scalars it cannot legalize
    blk = lambda i, t, f, q: (i, np.int32(0), np.int32(0))
    outm = lambda i, t, f, q: (t[i * G].astype(jnp.int32), np.int32(0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(NP // G,),
        in_specs=[
            pl.BlockSpec((G, 8, 128), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 8, 128), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 8, 128), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # x_hi, whole
            pl.BlockSpec(memory_space=pltpu.VMEM),      # x_lo, whole
        ],
        out_specs=[
            pl.BlockSpec((8, 128), outm, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), outm, memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        _make_kernel_ds(G),
        out_shape=[jax.ShapeDtypeStruct((n_row_tiles * 8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((n_row_tiles * 8, 128), jnp.float32)],
        grid_spec=grid_spec,
        interpret=interpret,
    )(pass_tile, pass_first, q0, lane, val_hi, val_lo, x_hi, x_lo)


def split_f64(x):
    """f64 array -> (hi, lo) f32 pair with hi + lo == x (exactly in f64)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


# ---------------------------------------------------------------------------
# On-device tile assembly.  The plan ships PACKED (slot, lane, val)
# entries (~9 B/nnz); the dense (NP, 8, 128) tiles the kernel reads are
# built by one sorted scatter on the target device — through a remote-
# TPU tunnel this is the difference between shipping ~40 MB and shipping
# the ~5 KB/pass mostly-zero tiles.  `deferred_assembly()` batches every
# GatherSpMV built inside it (a whole AMG hierarchy) into ONE scatter
# compile + ONE pipelined transfer.
# ---------------------------------------------------------------------------

_DEFER_STACK = []


class _DeferredAssembly:
    def __init__(self):
        import threading

        self.gops = []
        # register() runs on whichever thread builds a level (the setup
        # worker today) while flush() runs on the same worker and
        # finalize() on the main thread after executor.shutdown(); the
        # lock makes that safe even if a future caller registers from
        # another thread mid-loop (a lost gop would silently fall back
        # to eager assembly on the wrong device)
        self._lock = threading.Lock()

    def register(self, gop):
        with self._lock:
            self.gops.append(gop)

    def flush(self, target_device=None):
        """Assemble the gops registered SO FAR and clear them, leaving
        the context open.  Called per hierarchy level from the setup
        worker thread so each level's packed-plan transfer overlaps the
        next level's host graph work (the transfer rides the tunnel
        while scipy runs on the main thread)."""
        with self._lock:
            gops = [g for g in self.gops if g.chunks is None]
            self.gops = []
        if not gops:
            return
        # group by value dtype (in practice one group)
        by_dtype = {}
        for g in gops:
            by_dtype.setdefault(jnp.dtype(g.dtype), []).append(g)
        for dt, group in by_dtype.items():
            _assemble_group(group, dt, target_device)

    def finalize(self, target_device=None):
        """Assemble every registered GatherSpMV's tiles on the target."""
        self.flush(target_device)


def _assemble_group(gops, dtype, target_device):
    items = []          # (gop, chunk_idx, nflat, np_c)
    for g in gops:
        for ci, (meta, pk) in enumerate(zip(g._chunk_meta, g._packed)):
            p0, p1, _, _ = meta
            items.append((g, ci, (p1 - p0) * TILE_ROWS, p1 - p0))
    total = sum(n for _, _, n, _ in items)
    if total >= (1 << 31):
        for g in gops:
            g._assemble_now()
        return
    # slot wire format: uint16 deltas by default (7 B/nnz instead of 9
    # — worth ~300 ms of a degraded remote tunnel per 64³ setup).  The
    # decode is the two-level device cumsum (_two_level_cumsum): the
    # flat 1-D cumsum XLA-TPU compile is pathological (measured 101 s
    # for one 2M-entry chunk) and was why r3 shipped absolute slots.
    # Opt out with HYPREDRV_DELTA_SLOTS=0; delta still falls back to
    # absolute when any gap overflows uint16.
    import os as _os

    slot_parts = [np.asarray(it[0]._packed[it[1]][3], np.int64)
                  for it in items]
    deltas = []
    use_delta = _os.environ.get("HYPREDRV_DELTA_SLOTS", "1") != "0"
    if use_delta:
        for s in slot_parts:
            d = np.diff(s, prepend=np.int64(0))
            if len(d) and int(d.max()) >= (1 << 16):
                use_delta = False
                break
            deltas.append(d.astype(np.uint16))
    elane = np.concatenate([it[0]._packed[it[1]][4] for it in items])
    ds = bool(gops[0].ds)
    if ds:
        raw = np.concatenate([
            np.asarray(it[0]._packed[it[1]][5], dtype=np.float64)
            for it in items])
        evals = _ds_split_np(raw)
    else:
        evals = np.concatenate([
            np.asarray(it[0]._packed[it[1]][5], dtype=dtype)
            for it in items])
    # every small per-pass array (tile, first, q0-flat) rides in ONE
    # int32 buffer; the jit slices them back out — 4 transfers + 1
    # executable total, independent of chunk count
    meta_parts = []
    for (g, ci, _, _) in items:
        tile, first, q0f = g._packed[ci][0], g._packed[ci][1], \
            g._packed[ci][2]
        meta_parts += [tile, first, q0f]
    meta = np.concatenate(meta_parts).astype(np.int32)
    np_cs = tuple(it[3] for it in items)
    if use_delta:
        ebounds = np.zeros(len(items) + 1, np.int64)
        np.cumsum([len(s) for s in slot_parts], out=ebounds[1:])
        d_slots, d_elane, d_evals, d_meta = jax.device_put(
            (np.concatenate(deltas) if deltas
             else np.zeros(0, np.uint16),
             elane, evals, meta), target_device)
        parts = _batched_assemble_delta(
            tuple(int(b) for b in ebounds), np_cs,
            d_slots, d_elane, d_evals, d_meta)
    else:
        bases = np.zeros(len(items) + 1, np.int64)
        np.cumsum([n for _, _, n, _ in items], out=bases[1:])
        slots = np.concatenate([
            s + bases[i] for i, s in enumerate(slot_parts)
        ]).astype(np.int32)
        d_slots, d_elane, d_evals, d_meta = jax.device_put(
            (slots, elane, evals, meta), target_device)
        bounds = tuple(int(b) for b in bases)
        parts = _batched_assemble(bounds, np_cs, d_slots, d_elane,
                                  d_evals, d_meta)
    per_gop = {}
    for i, (g, ci, _, _) in enumerate(items):
        t0, t1 = g._chunk_meta[ci][2], g._chunk_meta[ci][3]
        tile, first, q0, val, lane = parts[i]
        per_gop.setdefault(id(g), (g, []))[1].append(
            (tile, first, q0, lane, val, t0, t1))
    for g, chunks in per_gop.values():
        g.chunks = chunks


@partial(jax.jit, static_argnums=(0, 1))
def _batched_assemble(bounds, np_cs, slots, elane, evals, meta):
    """One sorted scatter over the concatenated slot space, then static
    slices back out per chunk.  ``bounds`` is the (static) cumulative
    flat-size table, ``np_cs`` the per-chunk pass counts (the meta
    buffer holds tile|first|q0-flat per chunk); one compile serves the
    whole batch.  ``evals`` may be a single f32 array or a (hi, lo)
    f32 pair (double-single mode) — the pair is scattered twice and the
    chunk val comes back as a pair."""
    ds = isinstance(evals, (tuple, list))
    total = bounds[-1]
    if ds:
        vh = jnp.zeros(total, jnp.float32).at[slots].set(
            evals[0], unique_indices=True, indices_are_sorted=True)
        vl = jnp.zeros(total, jnp.float32).at[slots].set(
            evals[1], unique_indices=True, indices_are_sorted=True)
    else:
        val_flat = jnp.zeros(total, evals.dtype).at[slots].set(
            evals, unique_indices=True, indices_are_sorted=True)
    lane_flat = jnp.zeros(total, jnp.int32).at[slots].set(
        elane.astype(jnp.int32), unique_indices=True,
        indices_are_sorted=True).astype(jnp.int8)
    out = []
    m0 = 0
    for i in range(len(bounds) - 1):
        b0, b1 = bounds[i], bounds[i + 1]
        np_c = np_cs[i]
        tile = jax.lax.slice(meta, (m0,), (m0 + np_c,))
        first = jax.lax.slice(meta, (m0 + np_c,), (m0 + 2 * np_c,))
        q0 = jax.lax.slice(meta, (m0 + 2 * np_c,), (m0 + 10 * np_c,))
        m0 += 10 * np_c
        if ds:
            val = (
                jax.lax.slice(vh, (b0,), (b1,)).reshape(-1, 8, 128),
                jax.lax.slice(vl, (b0,), (b1,)).reshape(-1, 8, 128))
        else:
            val = jax.lax.slice(val_flat, (b0,), (b1,)).reshape(-1, 8, 128)
        out.append((
            tile, first, q0, val,
            jax.lax.slice(lane_flat, (b0,), (b1,)).reshape(-1, 8, 128)))
    return tuple(out)


def _two_level_cumsum(d):
    """Inclusive cumsum via a (rows, 4096) two-level scan — the flat
    1-D jnp.cumsum compiles pathologically on TPU (measured 101 s for
    2M elements vs 1.8 s for this formulation; XLA unrolls the long
    minor-dim scan)."""
    W = 4096
    n = d.shape[0]
    npad = -(-n // W) * W
    dp = jnp.zeros(npad, jnp.int32).at[:n].set(d.astype(jnp.int32))
    m = dp.reshape(-1, W)
    within = jnp.cumsum(m, axis=1)
    rows = jnp.cumsum(within[:, -1])
    base = rows - within[:, -1]
    return (within + base[:, None]).reshape(-1)[:n]


@partial(jax.jit, static_argnums=(0, 1))
def _batched_assemble_delta(ebounds, np_cs, deltas, elane, evals, meta):
    """Delta-slot variant of :func:`_batched_assemble`: per chunk, the
    absolute slots are rebuilt with one cumsum over the uint16 gaps
    (VPU-friendly) and scattered into that chunk's own flat tile space.
    ``ebounds`` is the (static) cumulative ENTRY count table."""
    ds = isinstance(evals, (tuple, list))
    out = []
    m0 = 0
    for i in range(len(np_cs)):
        e0, e1 = ebounds[i], ebounds[i + 1]
        np_c = np_cs[i]
        nflat = np_c * TILE_ROWS
        sl = _two_level_cumsum(jax.lax.slice(deltas, (e0,), (e1,)))
        el = jax.lax.slice(elane, (e0,), (e1,))
        lane = (jnp.zeros(nflat, jnp.int32)
                .at[sl].set(el.astype(jnp.int32), unique_indices=True,
                            indices_are_sorted=True)
                .astype(jnp.int8).reshape(-1, 8, 128))
        if ds:
            vh = jax.lax.slice(evals[0], (e0,), (e1,))
            vl = jax.lax.slice(evals[1], (e0,), (e1,))
            val = (
                jnp.zeros(nflat, jnp.float32).at[sl].set(
                    vh, unique_indices=True,
                    indices_are_sorted=True).reshape(-1, 8, 128),
                jnp.zeros(nflat, jnp.float32).at[sl].set(
                    vl, unique_indices=True,
                    indices_are_sorted=True).reshape(-1, 8, 128))
        else:
            ev = jax.lax.slice(evals, (e0,), (e1,))
            val = (jnp.zeros(nflat, evals.dtype)
                   .at[sl].set(ev, unique_indices=True,
                               indices_are_sorted=True)
                   .reshape(-1, 8, 128))
        tile = jax.lax.slice(meta, (m0,), (m0 + np_c,))
        first = jax.lax.slice(meta, (m0 + np_c,), (m0 + 2 * np_c,))
        q0 = jax.lax.slice(meta, (m0 + 2 * np_c,), (m0 + 10 * np_c,))
        m0 += 10 * np_c
        out.append((tile, first, q0, val, lane))
    return tuple(out)


def _ds_split_np(evals):
    """Host split of f64 values into the (hi, lo) f32 pair."""
    hi = evals.astype(np.float32)
    lo = (evals - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


@partial(jax.jit, static_argnums=(0,))
def _batched_unpack(layout, buf):
    """Slice one same-dtype staging buffer back into leaves.

    ``layout``: tuple of (offset, length, shape) in ELEMENTS — static,
    so one executable serves the whole group; pure slices + reshapes
    (no bitcasts — sub-word bitcast lowers catastrophically on TPU)."""
    out = []
    for (off, ln, shape) in layout:
        out.append(jax.lax.slice(buf, (off,), (off + ln,)).reshape(shape))
    return tuple(out)


def batched_device_put(tree, target_device=None):
    """Move a pytree of host/CPU arrays to the target with one transfer
    and one compiled unpack PER DTYPE GROUP — through a remote-TPU
    tunnel this replaces per-array dispatch round-trips (10-20 ms each)
    with a few pipelined copies.  Arrays already on the target pass
    through; dtypes needing x64 canonicalization (f64/i64/bool) take the
    normal device_put path."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    moved = list(leaves)
    groups = {}   # dtype name -> (idx list, parts list, layout list, off)
    rest_idx = []
    packable = {"float32", "int32", "int8", "uint8", "int16", "uint16",
                "uint32", "float16", "bfloat16"}
    for i, leaf in enumerate(leaves):
        if not isinstance(leaf, (np.ndarray, jnp.ndarray)):
            continue
        if isinstance(leaf, jnp.ndarray):
            devs = getattr(leaf, "devices", lambda: set())()
            if target_device is not None and devs == {target_device}:
                continue
            a = np.asarray(leaf)
        else:
            a = leaf
        if a.dtype.name not in packable or a.size == 0:
            rest_idx.append(i)
            continue
        g = groups.setdefault(a.dtype.name, [[], [], [], 0])
        g[0].append(i)
        g[1].append(np.ascontiguousarray(a).reshape(-1))
        g[2].append((g[3], a.size, a.shape))
        g[3] += a.size
    if rest_idx:
        rest_moved = jax.device_put([leaves[i] for i in rest_idx],
                                    target_device)
        for i, arr in zip(rest_idx, rest_moved):
            moved[i] = arr
    for name, (idx, parts, layout, _) in groups.items():
        buf = np.concatenate(parts)
        dbuf = jax.device_put(buf, target_device)
        unpacked = _batched_unpack(tuple(layout), dbuf)
        for i, arr in zip(idx, unpacked):
            moved[i] = arr
    return jax.tree_util.tree_unflatten(treedef, moved)


def deferred_assembly():
    """Context manager: GatherSpMV objects constructed inside defer their
    device-tile assembly; call ``ctx.finalize(device)`` after the block
    to batch-assemble all of them in one transfer + one compile."""
    import contextlib

    @contextlib.contextmanager
    def _cm():
        ctx = _DeferredAssembly()
        _DEFER_STACK.append(ctx)
        try:
            yield ctx
        finally:
            _DEFER_STACK.remove(ctx)
    return _cm()


def _chunk_bounds(plan: GatherPlan):
    """[(p0, p1, t0, t1), ...] pass/tile ranges, each within the SMEM
    budget and split at tile boundaries; None if a single tile exceeds
    the budget (caller falls back to XLA)."""
    NP = plan.num_passes
    if NP <= CHUNK_PASSES:
        return [(0, NP, 0, plan.n_row_tiles)]
    starts = np.append(np.flatnonzero(plan.pass_first), NP)
    bounds = []
    c0 = 0
    while c0 < NP:
        hi = int(np.searchsorted(starts, c0 + CHUNK_PASSES, side="right")) - 1
        c1 = int(starts[hi]) if starts[hi] > c0 else -1
        if c0 + CHUNK_PASSES >= NP:
            c1 = NP
        if c1 <= c0:
            return None
        t0 = int(plan.pass_tile[c0])
        t1 = int(plan.pass_tile[c1 - 1]) + 1
        bounds.append((c0, c1, t0, t1))
        c0 = c1
    return bounds


class GatherSpMV:
    """Device-side executor for a GatherPlan.

    Storage is per *chunk* (a contiguous run of tiles whose passes fit
    the SMEM scalar-prefetch budget): each chunk holds
    (tile-rebased, first, q0-flat, lane, val) device arrays plus static
    (t0, t1); most plans are a single chunk."""

    def __init__(self, plan: GatherPlan, dtype=jnp.float32,
                 force_xla: bool = False, interpret: bool = False,
                 force_ds: bool = False):
        self.plan = plan
        self.n_rows = plan.n_rows
        self.n_cols = plan.n_cols
        self.n_row_tiles = plan.n_row_tiles
        self.x_sublanes = plan.x_sublanes
        self.NP = plan.num_passes
        self.group = plan.group
        self.dtype = dtype
        # On non-Mosaic backends the interpreter would run one Python
        # step per pass — use the XLA segment-sum fallback instead
        # unless a test explicitly asks for interpret mode.  Mosaic has
        # no 64-bit support; f64 runs use the double-single (split-f32)
        # kernel variant instead (values and accumulator are (hi, lo)
        # f32 pairs with compensated arithmetic).
        self.interpret = interpret
        is64 = jnp.dtype(dtype).itemsize == 8
        self.ds = bool(is64 and not force_xla
                       and ((_backend_supports_pallas() and not interpret)
                            or force_ds))
        self.use_pallas = (self.NP > 0 and not force_xla
                           and not (is64 and not self.ds and not interpret)
                           and (interpret or _backend_supports_pallas()))
        bounds = _chunk_bounds(plan) if self.use_pallas else None
        if self.use_pallas and bounds is None:
            self.use_pallas = False
        if self.use_pallas:
            # keep the plan PACKED per chunk; dense tiles are assembled
            # on device (deferred: batched with the whole hierarchy)
            self._chunk_meta = bounds
            self._packed = []
            for (p0, p1, t0, t1) in bounds:
                e0 = int(np.searchsorted(plan.slot, p0 * TILE_ROWS, "left"))
                e1 = int(np.searchsorted(plan.slot, p1 * TILE_ROWS, "left"))
                self._packed.append((
                    np.ascontiguousarray(plan.pass_tile[p0:p1] - t0),
                    np.ascontiguousarray(plan.pass_first[p0:p1]),
                    np.ascontiguousarray(plan.q0[p0:p1].reshape(-1)),
                    np.ascontiguousarray(
                        (plan.slot[e0:e1] - p0 * TILE_ROWS)
                        .astype(np.int32)),
                    np.ascontiguousarray(plan.elane[e0:e1]),
                    np.ascontiguousarray(plan.evals[e0:e1]),
                ))
            self.chunks = None
            if _DEFER_STACK:
                _DEFER_STACK[-1].register(self)
            else:
                self._assemble_now()
        else:
            # XLA fallback keeps COO-style data
            rows, cols = plan.entry_rows_cols()
            self.f_rows = jnp.asarray(rows)
            self.f_cols = jnp.asarray(cols)
            self.f_vals = jnp.asarray(plan.evals, dtype=dtype)

    def _assemble_now(self):
        """Eager per-chunk device assembly (non-batched path)."""
        chunks = []
        for meta, pk in zip(self._chunk_meta, self._packed):
            p0, p1, t0, t1 = meta
            tile, first, q0f, slots, elane, evals = pk
            np_c = p1 - p0
            nflat = np_c * TILE_ROWS
            mbuf = np.concatenate([tile, first, q0f]).astype(np.int32)
            if self.ds:
                hi, lo = _ds_split_np(np.asarray(evals, np.float64))
                ev = (jnp.asarray(hi), jnp.asarray(lo))
            else:
                ev = jnp.asarray(evals, dtype=self.dtype)
            parts = _batched_assemble(
                (0, nflat), (np_c,), jnp.asarray(slots),
                jnp.asarray(elane), ev, jnp.asarray(mbuf))
            dtile, dfirst, dq0, val, lane = parts[0]
            chunks.append((dtile, dfirst, dq0, lane, val, t0, t1))
        self.chunks = chunks

    def _ensure_assembled(self):
        if self.use_pallas and self.chunks is None:
            self._assemble_now()

    # value-based identity on the STATIC metadata (everything that
    # shapes the traced computation; device arrays are pytree children).
    # Two same-shape plans from different systems of a sequence then
    # compare equal in pytree aux, so the jitted cycle's cache hits
    # instead of retracing per system.
    def _static_key(self):
        return (self.n_rows, self.n_cols, self.n_row_tiles,
                self.x_sublanes, self.NP, self.group,
                jnp.dtype(self.dtype).name, self.ds, self.use_pallas,
                self.interpret,
                tuple(self._chunk_meta) if self.use_pallas else None)

    def __eq__(self, other):
        if not isinstance(other, GatherSpMV):
            return NotImplemented
        return self._static_key() == other._static_key()

    def __hash__(self):
        return hash(self._static_key())

    def tree_children(self):
        if self.use_pallas:
            self._ensure_assembled()
            out = []
            for c in self.chunks:
                out.extend(c[:5])
            return tuple(out)
        return (self.f_rows, self.f_cols, self.f_vals)

    def set_children(self, ch):
        if self.use_pallas:
            self.chunks = [tuple(ch[i * 5:(i + 1) * 5]) + c[5:]
                           for i, c in enumerate(self.chunks)]
        else:
            (self.f_rows, self.f_cols, self.f_vals) = ch

    # -- structural helpers (diagnostics, scaling, host round-trip) -------

    def _chunk_val(self, c):
        """Effective value tile of one chunk (combines DS pairs)."""
        val = c[4]
        if self.ds:
            return val[0].astype(jnp.float64) + val[1].astype(jnp.float64)
        return val

    def _rows_cols(self, c):
        """(rows, cols) of one chunk as (np_c, 8, 128) device arrays
        (rows are global)."""
        tile, _, q0, lane, _, t0, _ = c
        np_c = tile.shape[0]
        s = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 1)
        l = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
        rows = ((tile[:, None, None] + t0) * TILE_ROWS + s * 128 + l)
        cols = q0.reshape(np_c, 8)[:, :, None] * 128 + lane
        return rows, cols

    def diagonal_contrib(self) -> jnp.ndarray:
        self._ensure_assembled()
        if self.NP == 0:
            return jnp.zeros(self.n_rows, self.dtype)
        if not self.use_pallas:
            mask = self.f_rows == self.f_cols
            d = jax.ops.segment_sum(jnp.where(mask, self.f_vals, 0.0),
                                    self.f_rows,
                                    num_segments=self.n_row_tiles * TILE_ROWS)
            return d[:self.n_rows]
        parts = []
        for c in self.chunks:
            tile, _, _, _, _, t0, t1 = c
            val = self._chunk_val(c)
            rows, cols = self._rows_cols(c)
            masked = jnp.where(rows == cols, val, 0.0)
            d = jax.ops.segment_sum(
                masked.reshape(tile.shape[0], TILE_ROWS), tile,
                num_segments=t1 - t0)
            parts.append(d.reshape(-1))
        return jnp.concatenate(parts)[:self.n_rows]

    def l1_contrib(self) -> jnp.ndarray:
        self._ensure_assembled()
        if self.NP == 0:
            return jnp.zeros(self.n_rows, self.dtype)
        if not self.use_pallas:
            d = jax.ops.segment_sum(jnp.abs(self.f_vals), self.f_rows,
                                    num_segments=self.n_row_tiles * TILE_ROWS)
            return d[:self.n_rows]
        parts = []
        for c in self.chunks:
            tile, _, _, _, _, t0, t1 = c
            val = self._chunk_val(c)
            d = jax.ops.segment_sum(
                jnp.abs(val).reshape(tile.shape[0], TILE_ROWS), tile,
                num_segments=t1 - t0)
            parts.append(d.reshape(-1))
        return jnp.concatenate(parts)[:self.n_rows]

    def scaled(self, sl, sr) -> "GatherSpMV":
        """New executor with values Sl·V·Sr (device-side)."""
        self._ensure_assembled()
        import copy

        out = copy.copy(self)
        if not self.use_pallas:
            v = self.f_vals
            if sl is not None:
                v = v * sl[self.f_rows]
            if sr is not None:
                v = v * sr[self.f_cols]
            out.f_vals = v
            return out
        slp = srp = None
        if sl is not None:
            slp = jnp.concatenate([
                sl.astype(self.dtype),
                jnp.zeros(self.n_row_tiles * TILE_ROWS - self.n_rows,
                          self.dtype)]).reshape(self.n_row_tiles, 8, 128)
        if sr is not None:
            srp = jnp.concatenate([
                sr.astype(self.dtype),
                jnp.zeros(self.x_sublanes * 128 - self.n_cols, self.dtype)])
        new_chunks = []
        for c in self.chunks:
            tile, first, q0, lane, val, t0, t1 = c
            if self.ds:
                val = self._chunk_val(c)
            if slp is not None:
                val = val * slp[tile + t0]
            if srp is not None:
                _, cols = self._rows_cols(c)
                val = val * srp[cols]   # one-off XLA gather: setup path
            if self.ds:
                hi = val.astype(jnp.float32)
                lo = (val - hi.astype(jnp.float64)).astype(jnp.float32)
                val = (hi, lo)
            new_chunks.append((tile, first, q0, lane, val, t0, t1))
        out.chunks = new_chunks
        return out

    def to_coo_host(self):
        """(rows, cols, vals) numpy arrays of the planned entries."""
        self._ensure_assembled()
        if self.NP == 0:
            return (np.empty(0, np.int64), np.empty(0, np.int64),
                    np.empty(0))
        if not self.use_pallas:
            return (np.asarray(self.f_rows), np.asarray(self.f_cols),
                    np.asarray(self.f_vals))
        rr, cc, vv = [], [], []
        for c in self.chunks:
            rows, cols = self._rows_cols(c)
            rows, cols, vals = (np.asarray(rows), np.asarray(cols),
                                np.asarray(self._chunk_val(c)))
            mask = vals != 0
            rr.append(rows[mask])
            cc.append(cols[mask])
            vv.append(vals[mask])
        return np.concatenate(rr), np.concatenate(cc), np.concatenate(vv)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """y = A_rest @ x for the planned entries."""
        self._ensure_assembled()
        if self.NP == 0:
            return jnp.zeros(self.n_rows, x.dtype)
        if not self.use_pallas:
            y = jax.ops.segment_sum(self.f_vals * x[self.f_cols],
                                    self.f_rows,
                                    num_segments=self.n_row_tiles * TILE_ROWS)
            return y[:self.n_rows]
        xp = jnp.zeros(self.x_sublanes * 128, x.dtype)
        xp = jax.lax.dynamic_update_slice(xp, x.astype(self.dtype), (0,))
        if self.ds:
            xh, xl = split_f64(xp)
            x_pair = (xh.reshape(self.x_sublanes, 128),
                      xl.reshape(self.x_sublanes, 128))
            parts = []
            for c in self.chunks:
                tile, first, q0, lane, val, t0, t1 = c
                yh, yl = _gather_spmv_call_ds(
                    (t1 - t0, tile.shape[0], self.group),
                    tile, first, q0, lane, val[0], val[1], x_pair,
                    self.interpret)
                parts.append(yh.astype(jnp.float64)
                             + yl.astype(jnp.float64))
            y = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
            return y.reshape(-1)[:self.n_rows].astype(x.dtype)
        x_pad = xp.reshape(self.x_sublanes, 128)
        parts = []
        for c in self.chunks:
            tile, first, q0, lane, val, t0, t1 = c
            parts.append(_gather_spmv_call(
                (t1 - t0, tile.shape[0], self.group),
                tile, first, q0, lane, val, self.interpret, x_pad))
        y = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        return y.reshape(-1)[:self.n_rows].astype(x.dtype)
