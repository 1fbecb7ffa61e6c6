"""Pallas DIA matvec — the fine-grid SpMV fast path.

The hybrid device matrix (ops/device_matrix.py) stores stencil-like
operators as dense diagonals; the XLA formulation (shifted
dynamic-slices + multiply-adds) runs far below the HBM roofline
because every diagonal's shifted x view and partial sum materializes
through HBM.  (The v5e HBM triad slope-times at ~690 GB/s; this kernel
reaches ~790 GB/s effective on the 64³ stencil because the
loop-invariant diagonal blocks ride VMEM.)

This kernel runs the whole accumulation in VMEM:

* x streams HBM->VMEM once as a whole-array operand; grid step 0 copies
  it into a VMEM scratch with zero margins sized by the most negative /
  most positive diagonal offset (VMEM->VMEM, no extra HBM traffic; the
  scratch persists across the sequential TPU grid);
* each diagonal offset decomposes statically as off = 128*q + r with
  0 <= r < 128: the shifted window of output tile i is the B-sublane
  read at i*B + q (+1), lane-rotated by the *compile-time* r via two
  static lane slices and a concat — no gather, no scalar core;
* the (D, B, 128) diagonal blocks stream from HBM once, y streams out
  once: total traffic ~ (D + 2)*4 bytes/row, the analytic minimum;
* B (block sublanes) is sized so the grid has a handful of steps —
  r04 shipped B=8 (256 grid steps of 28 KB DMAs) and per-step overhead
  capped the kernel at ~120 GB/s; B=256 measures ~340 GB/s on the same
  operand (block-size sweep, round 5).

Falls back to the XLA path off-TPU and for f64 (Mosaic has no 64-bit).
Reference counterpart: hypre's CSR SpMV (hypre_CSRMatrixMatvec) — the
diagonal storage itself is the TPU-first re-design, see
ops/device_matrix.py.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def _make_dia_kernel(D, qr, PLO, B, L, copy_steps):
    """qr: static (q, r) per diagonal; PLO: leading margin sublanes of
    the scratch; B: block sublanes; L: x sublanes (copied to scratch at
    offset PLO on grid step 0, in ``copy_steps`` chunks)."""
    def _kernel(dia_ref, x_ref, y_ref, xs_ref):
        from jax.experimental import pallas as pl

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            # zero the whole scratch (margins included), then lay x in
            # at offset PLO — all VMEM->VMEM, no HBM traffic
            xs_ref[...] = jnp.zeros_like(xs_ref)
            step = -(-L // copy_steps)
            for c in range(copy_steps):
                lo = c * step
                sz = min(step, L - lo)
                if sz > 0:
                    xs_ref[pl.ds(PLO + lo, sz), :] = x_ref[pl.ds(lo, sz), :]

        acc = None
        for d in range(D):
            q, r = qr[d]
            base = i * B + q + PLO
            w0 = xs_ref[pl.ds(base, B), :]
            if r:
                w1 = xs_ref[pl.ds(base + 1, B), :]
                sh = jnp.concatenate([w0[:, r:], w1[:, :r]], axis=1)
            else:
                sh = w0
            term = dia_ref[d] * sh
            acc = term if acc is None else acc + term
        y_ref[...] = acc
    return _kernel


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6))
def _dia_matvec_call(qr, PLO, n_tiles, B, L, xs_sub, interpret,
                     dia3, x2):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D = dia3.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((D, B, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),       # x, whole
        ],
        out_specs=pl.BlockSpec((B, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((xs_sub, 128), dia3.dtype)],
    )
    return pl.pallas_call(
        _make_dia_kernel(D, qr, PLO, B, L, copy_steps=1),
        out_shape=jax.ShapeDtypeStruct((n_tiles * B, 128), dia3.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(dia3, x2)


def _make_dia_kernel_windowed(D, qr, min_q, base_off, B, W):
    """Windowed-x variant for operands past the whole-x VMEM budget:
    x (padded, HBM-resident) is DMA'd per grid step as the (W, 128)
    halo window of output tile i, double-buffered against the compute
    of tile i-1.  All diagonal reads become STATIC in-window slices
    (in-window offset = q − min_q)."""
    def _kernel(dia_ref, x_hbm, y_ref, xw, sems):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        i = pl.program_id(0)
        n = pl.num_programs(0)

        def window_dma(slot, tile):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(tile * B + base_off, W)], xw.at[slot],
                sems.at[slot])

        @pl.when(i == 0)
        def _():
            window_dma(0, 0).start()

        @pl.when(i + 1 < n)
        def _():
            window_dma((i + 1) % 2, i + 1).start()

        window_dma(i % 2, i).wait()
        cur = i % 2
        acc = None
        for d in range(D):
            q, r = qr[d]
            base = q - min_q                     # static in-window
            w0 = xw[cur, base:base + B, :]
            if r:
                w1 = xw[cur, base + 1:base + 1 + B, :]
                sh = jnp.concatenate([w0[:, r:], w1[:, :r]], axis=1)
            else:
                sh = w0
            term = dia_ref[d] * sh
            acc = term if acc is None else acc + term
        y_ref[...] = acc
    return _kernel


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6))
def _dia_matvec_call_windowed(qr, min_q, base_off, n_tiles, B, W,
                              interpret, dia3, x_pad):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D = dia3.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((D, B, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),        # x stays HBM
        ],
        out_specs=pl.BlockSpec((B, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, W, 128), dia3.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    return pl.pallas_call(
        _make_dia_kernel_windowed(D, qr, min_q, base_off, B, W),
        out_shape=jax.ShapeDtypeStruct((n_tiles * B, 128), dia3.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(dia3, x_pad)


class DiaSpMV:
    """Precomputed static layout for one (offsets, shape) DIA operand.

    Two kernel modes by operand size:

    * whole-x (default): x copied once into a persistent VMEM scratch —
      usable to ~1.5M columns in f32;
    * windowed-x: x stays in HBM (pre-padded with the diagonal margins)
      and each grid step double-buffer-DMAs its (B + q-span, 128) halo
      window — usable until the window itself outgrows VMEM (≈500³
      grids for 7-point stencils).

    Beyond both, ``fits`` is False and the XLA path serves.
    """

    VMEM_X_LIMIT = 3 << 20        # x elements (operand + scratch) budget
    # windowed mode: double-buffered windows + double-buffered diagonal
    # blocks must share the ~16 MB scoped VMEM (byte-accurate check in
    # __init__; reaches ~500³ 7-point grids)
    VMEM_TOTAL_BYTES = 14 << 20
    MAX_BLOCK_SUBLANES = 256      # ~0.9 MB/diag-block at D=7 f32

    def __init__(self, dia_offsets, n_rows: int, n_cols: int, dtype,
                 interpret: bool = False):
        self.offsets = tuple(int(o) for o in dia_offsets)
        self.n_rows = n_rows
        self.n_cols = n_cols
        self.dtype = jnp.dtype(dtype)
        self.interpret = interpret
        # off = 128 q + r, 0 <= r < 128 (python floor-div handles
        # negative offsets)
        self.qr = tuple((int(o) // 128, int(o) % 128)
                        for o in self.offsets)
        min_q = min(q for q, _ in self.qr)
        max_q = max(q for q, _ in self.qr)
        self.PLO = max(0, -min_q)
        # block sublanes: large enough that per-grid-step overhead
        # amortizes, small enough that the double-buffered (D, B, 128)
        # diagonal blocks stay inside the ~16 MB VMEM scoped limit
        # (wide-D coarse operators OOM at B=256)
        D = max(1, len(self.offsets))
        row_sub = -(-n_rows // 128)
        budget = 10 << 20          # bytes for 2x (D, B, 128) f32 blocks
        B = self.MAX_BLOCK_SUBLANES
        while B > 8 and (B >= 2 * row_sub
                         or 2 * D * B * 128 * 4 > budget):
            B //= 2
        self.B = B
        self.n_tiles = -(-row_sub // B)
        self.out_sub = self.n_tiles * B
        # x operand sublanes (exact cols, padded to whole sublanes)
        self.L = -(-n_cols // 128)
        # scratch: margins + every read in range.  Reads reach
        # (n_tiles-1)*B + (B-1) + max_q + PLO + 1 inclusive.
        need = self.out_sub + max_q + self.PLO + 2
        self.xs_sub = max(need, self.L + self.PLO + 1)
        whole_ok = (self.xs_sub + self.L) * 128 <= self.VMEM_X_LIMIT
        # windowed mode: per-tile halo window of B + q-span (+2 for the
        # lane-rotation carry) sublanes, double-buffered; window base
        # for tile i is i*B + base_off in the padded operand
        self.min_q = min_q
        self.base_off = min_q + self.PLO         # = max(min_q, 0)
        self.W = self.B + (max_q - min_q) + 2
        # padded operand length: last window end, and the real x data
        self.win_total = max(
            self.out_sub + self.base_off + (self.W - self.B),
            self.L + self.PLO)
        win_bytes = 2 * self.W * 128 * 4
        dia_bytes = 2 * D * self.B * 128 * 4
        out_bytes = 2 * self.B * 128 * 4
        windowed_ok = (win_bytes + dia_bytes + out_bytes
                       <= self.VMEM_TOTAL_BYTES)
        self.windowed = (not whole_ok) and windowed_ok
        self.fits = ((whole_ok or windowed_ok)
                     and self.dtype.itemsize == 4)

    def pad_dia(self, dia_data) -> jnp.ndarray:
        """(D, n_rows) host/device values → (D, out_sub, 128)."""
        D = len(self.offsets)
        pad = self.out_sub * 128 - self.n_rows
        d = jnp.asarray(dia_data, self.dtype)
        if pad:
            d = jnp.concatenate(
                [d, jnp.zeros((D, pad), self.dtype)], axis=1)
        return d.reshape(D, self.out_sub, 128)

    def __call__(self, dia3: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        xv = x.astype(self.dtype)
        if self.windowed:
            # pad x in HBM with the diagonal margins so every window
            # read [i*B + base_off, +W) is in range
            total = self.win_total
            xp = jnp.zeros(total * 128, self.dtype)
            xp = jax.lax.dynamic_update_slice(xp, xv, (self.PLO * 128,))
            y = _dia_matvec_call_windowed(
                self.qr, self.min_q, self.base_off, self.n_tiles,
                self.B, self.W, self.interpret, dia3,
                xp.reshape(total, 128))
        else:
            xlen = self.L * 128
            if xlen != self.n_cols:
                xv = jnp.concatenate(
                    [xv, jnp.zeros(xlen - self.n_cols, self.dtype)])
            y = _dia_matvec_call(self.qr, self.PLO, self.n_tiles, self.B,
                                 self.L, self.xs_sub, self.interpret,
                                 dia3, xv.reshape(self.L, 128))
        y = y.reshape(-1)
        if self.out_sub * 128 != self.n_rows:
            y = y[:self.n_rows]
        return y.astype(x.dtype)
