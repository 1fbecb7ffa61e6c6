"""Pallas windowed gather-SpMV (see ops/gather_plan.py for the plan).

One grid step per pass.  The x operand lives fully in VMEM as
(x_sublanes, 128); each pass slices an 8-sublane window with a
scalar-prefetched start, then runs 8 broadcast + lane-gather + select
steps — the only gather primitive Mosaic supports everywhere is
``take_along_axis(op, idx, axis=1)`` on (T, 128) tiles, so the kernel is
built exclusively from it.

Speed: ~2 orders of magnitude over XLA's scalar-core gather for AMG
coarse-operator SpMVs (measured on the driver TPU: 0.09 -> ~5+ Gnnz/s).
Falls back to the XLA gather formulation on backends without Mosaic
(tests run it in interpret mode on CPU for bit-parity).
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


def _kernel(tile_ref, q0_ref, first_ref, sub_ref, lane_ref, val_ref,
            x_ref, y_ref):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    q0 = q0_ref[i]

    @pl.when(first_ref[i] == 1)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    win = x_ref[pl.ds(q0, 8), :]          # (8, 128) window of x
    sub = sub_ref[0]
    lane = lane_ref[0]
    val = val_ref[0]
    acc = jnp.zeros((8, 128), val.dtype)
    for j in range(8):
        row = jnp.broadcast_to(win[j, :], (8, 128))
        g = jnp.take_along_axis(row, lane, axis=1)
        acc = acc + jnp.where(sub == j, g * val, 0.0)
    y_ref[...] = y_ref[...] + acc


@partial(jax.jit, static_argnums=(0, 7))
def _gather_spmv_call(shape_info, pass_tile, pass_q0, pass_first,
                      sub, lane, val, interpret, x_pad):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_row_tiles, x_sublanes, NP = shape_info
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(NP,),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda i, t, q, f: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i, t, q, f: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i, t, q, f: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # x, whole
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i, t, q, f: (t[i], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n_row_tiles * 8, 128), val.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(pass_tile, pass_q0, pass_first, sub, lane, val, x_pad)


class GatherSpMV:
    """Device-side executor for a GatherPlan."""

    def __init__(self, plan: GatherPlan, dtype=jnp.float32,
                 force_xla: bool = False, interpret: bool = False):
        self.plan = plan
        self.n_rows = plan.n_rows
        self.n_cols = plan.n_cols
        self.n_row_tiles = plan.n_row_tiles
        self.x_sublanes = plan.x_sublanes
        self.NP = plan.num_passes
        self.dtype = dtype
        # On non-Mosaic backends the interpreter would run one Python
        # step per pass — use the XLA segment-sum fallback instead
        # unless a test explicitly asks for interpret mode.  Mosaic has
        # no 64-bit support, so f64 parity runs take the XLA path too.
        self.interpret = interpret
        is64 = jnp.dtype(dtype).itemsize == 8
        self.use_pallas = (self.NP > 0 and not force_xla
                           and not (is64 and not interpret)
                           and (interpret or _backend_supports_pallas()))
        if self.use_pallas:
            self.pass_tile = jnp.asarray(plan.pass_tile)
            self.pass_q0 = jnp.asarray(plan.pass_q0)
            self.pass_first = jnp.asarray(plan.pass_first)
            # transfer int8; widening to int32 happens lazily inside the
            # caller's jit (one fused convert per compiled program instead
            # of an eager dispatch per array at setup time)
            self.sub = jnp.asarray(plan.sub)
            self.lane = jnp.asarray(plan.lane)
            self.val = jnp.asarray(plan.val, dtype=dtype)
        else:
            # XLA fallback keeps COO-style data
            mask = plan.val != 0
            p, s, l = np.nonzero(mask)
            self.f_rows = jnp.asarray(
                plan.pass_tile[p] * TILE_ROWS + s * 128 + l)
            self.f_cols = jnp.asarray(
                (plan.pass_q0[p] + plan.sub[mask]) * 128 + plan.lane[mask])
            self.f_vals = jnp.asarray(plan.val[mask], dtype=dtype)

    def tree_children(self):
        if self.use_pallas:
            return (self.pass_tile, self.pass_q0, self.pass_first,
                    self.sub, self.lane, self.val)
        return (self.f_rows, self.f_cols, self.f_vals)

    def set_children(self, ch):
        if self.use_pallas:
            (self.pass_tile, self.pass_q0, self.pass_first,
             self.sub, self.lane, self.val) = ch
        else:
            (self.f_rows, self.f_cols, self.f_vals) = ch

    # -- structural helpers (diagnostics, scaling, host round-trip) -------

    def _rows_cols(self):
        """(rows, cols) as (NP, 8, 128) device arrays."""
        s = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 1)
        l = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
        rows = (self.pass_tile[:, None, None] * TILE_ROWS + s * 128 + l)
        cols = (self.pass_q0[:, None, None] + self.sub) * 128 + self.lane
        return rows, cols

    def diagonal_contrib(self) -> jnp.ndarray:
        if self.NP == 0:
            return jnp.zeros(self.n_rows, self.dtype)
        if not self.use_pallas:
            mask = self.f_rows == self.f_cols
            d = jax.ops.segment_sum(jnp.where(mask, self.f_vals, 0.0),
                                    self.f_rows,
                                    num_segments=self.n_row_tiles * TILE_ROWS)
            return d[:self.n_rows]
        rows, cols = self._rows_cols()
        masked = jnp.where(rows == cols, self.val, 0.0)
        d = jax.ops.segment_sum(masked.reshape(self.NP, TILE_ROWS),
                                self.pass_tile,
                                num_segments=self.n_row_tiles)
        return d.reshape(-1)[:self.n_rows]

    def l1_contrib(self) -> jnp.ndarray:
        if self.NP == 0:
            return jnp.zeros(self.n_rows, self.dtype)
        if not self.use_pallas:
            d = jax.ops.segment_sum(jnp.abs(self.f_vals), self.f_rows,
                                    num_segments=self.n_row_tiles * TILE_ROWS)
            return d[:self.n_rows]
        d = jax.ops.segment_sum(
            jnp.abs(self.val).reshape(self.NP, TILE_ROWS), self.pass_tile,
            num_segments=self.n_row_tiles)
        return d.reshape(-1)[:self.n_rows]

    def scaled(self, sl, sr) -> "GatherSpMV":
        """New executor with values Sl·V·Sr (device-side)."""
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
        rows, cols = self._rows_cols()
        v = self.val
        if sl is not None:
            slp = jnp.concatenate([
                sl.astype(self.dtype),
                jnp.zeros(self.n_row_tiles * TILE_ROWS - self.n_rows,
                          self.dtype)])
            v = v * slp.reshape(self.n_row_tiles, 8, 128)[self.pass_tile]
        if sr is not None:
            srp = jnp.concatenate([
                sr.astype(self.dtype),
                jnp.zeros(self.x_sublanes * 128 - self.n_cols, self.dtype)])
            v = v * srp[cols]       # one-off XLA gather: setup, not hot
        out.val = v
        return out

    def to_coo_host(self):
        """(rows, cols, vals) numpy arrays of the planned entries."""
        if self.NP == 0:
            import numpy as _np

            return (_np.empty(0, _np.int64), _np.empty(0, _np.int64),
                    _np.empty(0))
        if not self.use_pallas:
            return (np.asarray(self.f_rows), np.asarray(self.f_cols),
                    np.asarray(self.f_vals))
        rows, cols = self._rows_cols()
        rows, cols, vals = (np.asarray(rows), np.asarray(cols),
                            np.asarray(self.val))
        mask = vals != 0
        return rows[mask], cols[mask], vals[mask]

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """y = A_rest @ x for the planned entries."""
        if self.NP == 0:
            return jnp.zeros(self.n_rows, x.dtype)
        if not self.use_pallas:
            y = jax.ops.segment_sum(self.f_vals * x[self.f_cols],
                                    self.f_rows,
                                    num_segments=self.n_row_tiles * TILE_ROWS)
            return y[:self.n_rows]
        xp = jnp.zeros(self.x_sublanes * 128, x.dtype)
        xp = jax.lax.dynamic_update_slice(xp, x.astype(self.dtype), (0,))
        x_pad = xp.reshape(self.x_sublanes, 128)
        sub = self.sub.astype(jnp.int32)
        lane = self.lane.astype(jnp.int32)
        y = _gather_spmv_call(
            (self.n_row_tiles, self.x_sublanes, self.NP),
            self.pass_tile, self.pass_q0, self.pass_first,
            sub, lane, self.val, self.interpret, x_pad)
        return y.reshape(-1)[:self.n_rows].astype(x.dtype)
