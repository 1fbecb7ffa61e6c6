"""Preconditioner reuse engine (static policy v1; adaptive scorer follows).

Reference: include/internal/precon_reuse.h + src/internal/precon_reuse.c —
skip preconditioner rebuilds across a sequence of systems.  Pure host
logic.  The cross-rank collective agreement (ref: src/HYPREDRV.c:233-256)
maps to a process_allgather max when multi-controller.
"""

from __future__ import annotations

from typing import List, Optional


class PreconReuseState:
    def __init__(self, reuse_args):
        self.args = reuse_args
        self.enabled = bool(reuse_args.enabled)
        self.solves_since_rebuild = 0
        self.observations: List[dict] = []
        self.last_rebuild_id: Optional[int] = None

    # -- decision ----------------------------------------------------------

    def note_rebuild(self, ls_id: int):
        """Record an unconditional rebuild (first build of a precon)."""
        self.solves_since_rebuild = 0
        self.last_rebuild_id = ls_id

    def should_rebuild(self, ls_id: int, stats=None) -> bool:
        """Collective rebuild decision
        (ref: PreconReuseShouldRebuildCollective)."""
        if not self.enabled:
            return True
        decision = self._decide(ls_id)
        decision = self._sync(decision)
        if decision:
            self.solves_since_rebuild = 0
            self.last_rebuild_id = ls_id
        return decision

    def _decide(self, ls_id: int) -> bool:
        a = self.args
        ids = a.get("linear_system_ids")
        if ids is not None:
            if isinstance(ids, str) and ids.strip().lower() == "always":
                return False  # never rebuild beyond the first
            if isinstance(ids, (list, tuple)):
                return ls_id in [int(i) for i in ids]
        freq = int(a.get("frequency") or 0)
        if freq > 0:
            return (ls_id % freq) == 0
        guards = a.get("guards") or {}
        max_reuse = int(guards.get("max_reuse_solves") or 0)
        if max_reuse > 0 and self.solves_since_rebuild >= max_reuse:
            return True
        # static policy with no schedule: reuse forever after first build
        return self.last_rebuild_id is None

    def should_keep(self, ls_id: int) -> bool:
        """Whether to keep the precon alive after this solve
        (ref: main.c:221 — precon kept if reuse says so)."""
        return self.enabled

    def _sync(self, decision: bool) -> bool:
        try:
            import jax

            if jax.process_count() > 1:
                import numpy as np
                from jax.experimental import multihost_utils

                agreed = multihost_utils.process_allgather(
                    np.int32(1 if decision else 0)).max()
                return bool(agreed)
        except Exception:
            pass
        return decision

    # -- observations ------------------------------------------------------

    def record_observation(self, ls_id: int, stats, result):
        """ref: hypredrv_PreconReuseBuildObservation (precon_reuse.c:476)."""
        self.solves_since_rebuild += 1
        self.observations.append({
            "ls_id": ls_id,
            "iters": result.iters,
            "solve_time": result.solve_time,
            "converged": result.converged,
        })
        guards = self.args.get("guards") or {}
        if not result.converged and guards.get("rebuild_on_solver_failure",
                                               True):
            # force next decision to rebuild
            self.last_rebuild_id = None
