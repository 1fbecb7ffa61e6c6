"""Preconditioner reuse engine: static + adaptive policies.

Reference: include/internal/precon_reuse.h + src/internal/precon_reuse.c.
Skip preconditioner rebuilds across a sequence of systems.  Pure host
logic:

* **static** — rebuild every N systems (``frequency``), on explicit ids
  (``linear_system_ids``), per timestep, or never ("always" reuse).
* **adaptive** — a weighted score over observation components
  (metrics iterations / solve_time / setup_time / total_time /
  solve_overhead_vs_setup; transforms raw / delta / ratio /
  relative_increase vs the post-rebuild baseline; arithmetic / power /
  geometric means over a bounded history window), compared against
  ``rebuild_threshold``, with guard rails (min/max reuse solves,
  iteration/time ratio caps, rebuild on new timestep / solver failure).

The decision is agreed across processes (reference: MPI_Allreduce MAX,
src/HYPREDRV.c:233-256 → process_allgather max here) and logged with a
summary string (ref: PreconReuseDecision.summary).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..core.logging import log


class PreconReuseState:
    def __init__(self, reuse_args):
        self.args = reuse_args
        self.enabled = bool(reuse_args.enabled)
        self.solves_since_rebuild = 0
        self.observations: List[dict] = []      # all solves
        self.baseline: Optional[dict] = None     # first solve after rebuild
        self.last_rebuild_id: Optional[int] = None
        self.bad_decisions = 0
        self.timesteps: Optional[List[int]] = None  # ls_id → timestep
        self.last_timestep: Optional[int] = None
        self.force_rebuild = False

    # -- timestep schedule (from file or lsseq; ref PreconReuseTimesteps) --

    def set_timesteps(self, timesteps: List[int]):
        self.timesteps = list(timesteps)

    def _timestep_of(self, ls_id: int) -> Optional[int]:
        if self.timesteps is None or ls_id >= len(self.timesteps):
            return None
        return self.timesteps[ls_id]

    # -- decision ----------------------------------------------------------

    def note_rebuild(self, ls_id: int):
        """Record an unconditional rebuild (first build of a precon)."""
        self.solves_since_rebuild = 0
        self.baseline = None
        self.bad_decisions = 0
        self.force_rebuild = False
        self.last_rebuild_id = ls_id
        self.last_timestep = self._timestep_of(ls_id)

    def should_rebuild(self, ls_id: int, stats=None) -> bool:
        """Collective rebuild decision
        (ref: PreconReuseShouldRebuildCollective)."""
        if not self.enabled:
            return True
        decision, summary = self._decide(ls_id)
        decision = self._sync(decision)
        log(2, f"precon reuse decision for ls #{ls_id}: "
               f"{'REBUILD' if decision else 'REUSE'} ({summary})")
        if decision:
            self.note_rebuild(ls_id)
        return decision

    def _decide(self, ls_id: int):
        a = self.args
        guards = a.get("guards") or {}

        if self.force_rebuild:
            return True, "forced (solver failure)"
        if self.last_rebuild_id is None:
            return True, "no preconditioner built yet"

        # timestep guard
        ts = self._timestep_of(ls_id)
        if guards.get("rebuild_on_new_timestep") and ts is not None \
                and ts != self.last_timestep:
            return True, f"new timestep {ts}"
        if a.get("per_timestep") and ts is not None \
                and ts != self.last_timestep:
            return True, f"per_timestep: timestep {ts}"

        # static schedules
        ids = a.get("linear_system_ids")
        if ids is not None:
            if isinstance(ids, str) and ids.strip().lower() == "always":
                return False, "static: always reuse"
            if isinstance(ids, (list, tuple)):
                hit = ls_id in [int(i) for i in ids]
                return hit, f"static ids: {'hit' if hit else 'miss'}"
        freq = int(a.get("frequency") or 0)
        if freq > 0:
            hit = (ls_id % freq) == 0
            return hit, f"static frequency {freq}"

        # guard rails
        min_reuse = int(guards.get("min_reuse_solves") or 0)
        if min_reuse and self.solves_since_rebuild < min_reuse:
            return False, f"min_reuse_solves {min_reuse} not reached"
        max_reuse = int(guards.get("max_reuse_solves") or 0)
        if max_reuse and self.solves_since_rebuild >= max_reuse:
            return True, f"max_reuse_solves {max_reuse} reached"

        last = self.observations[-1] if self.observations else None
        if last is not None and self.baseline is not None:
            cap = float(guards.get("max_iteration_ratio") or 0)
            if cap > 0 and self.baseline["iters"] > 0:
                ratio = last["iters"] / self.baseline["iters"]
                if ratio > cap:
                    return True, f"iteration ratio {ratio:.2f} > {cap}"
            cap = float(guards.get("max_solve_time_ratio") or 0)
            if cap > 0 and self.baseline["solve_time"] > 0:
                ratio = last["solve_time"] / self.baseline["solve_time"]
                if ratio > cap:
                    return True, f"solve time ratio {ratio:.2f} > {cap}"

        if int(a.get("policy") or 0) == 1:  # adaptive
            return self._adaptive_decide(ls_id)
        # static policy with no schedule: reuse until a guard fires
        return False, "static: reuse"

    # -- adaptive scorer ------------------------------------------------------

    def _adaptive_decide(self, ls_id: int):
        a = self.args
        adaptive = a.get("adaptive") or {}
        guards = a.get("guards") or {}
        components = adaptive.get("components") or []
        min_hist = int(guards.get("min_history_points") or 1)
        if len(self.observations) < max(1, min_hist):
            return False, "adaptive: insufficient history"
        if not components:
            components = [{"metric": "iterations", "weight": 1.0,
                           "transform": {"kind": "relative_increase"}}]

        score = 0.0
        wsum = 0.0
        details = []
        for comp in components:
            c = dict(comp) if isinstance(comp, dict) else {}
            weight = float(c.get("weight", 1.0))
            val = self._component_value(c)
            score += weight * val
            wsum += abs(weight)
            details.append(f"{c.get('metric', 'iterations')}={val:.3f}")
        if wsum > 0:
            score /= wsum
        floor = float(adaptive.get("positive_floor") or 0.0)
        score = max(score, floor) if floor else score
        threshold = float(adaptive.get("rebuild_threshold") or 0.5)
        decision = score >= threshold
        summary = (f"adaptive score {score:.3f} "
                   f"{'≥' if decision else '<'} threshold {threshold} "
                   f"[{', '.join(details)}]")
        if decision:
            self.bad_decisions += 1
            bad_cap = int(guards.get("bad_decisions_to_rebuild") or 1)
            if self.bad_decisions < bad_cap:
                return False, summary + f" (bad {self.bad_decisions}/{bad_cap})"
        else:
            self.bad_decisions = 0
        return decision, summary

    def _component_value(self, comp: dict) -> float:
        metric = comp.get("metric", "iterations")
        if isinstance(metric, int):
            metric = {0: "iterations", 1: "solve_time", 2: "setup_time",
                      3: "total_time",
                      4: "solve_overhead_vs_setup"}.get(metric, "iterations")
        metric = str(metric).lower()
        hist_cfg = comp.get("history") or {}
        max_points = int(hist_cfg.get("max_points", 8))
        window = self.observations[-max_points:]
        raw = np.array([self._metric(o, metric) for o in window])
        if raw.size == 0:
            return 0.0

        mean_cfg = comp.get("mean") or {}
        kind = mean_cfg.get("kind", 0)
        power = float(mean_cfg.get("power", 1.0))
        if kind in (1, "power") and power != 0:
            m = float(np.mean(raw ** power) ** (1.0 / power))
        elif kind in (2, "geometric"):
            m = float(np.exp(np.mean(np.log(np.maximum(raw, 1e-300)))))
        else:
            m = float(np.mean(raw))

        tr = comp.get("transform") or {}
        tkind = tr.get("kind", 0)
        tkind = {0: "raw", 1: "delta", 2: "ratio", 3: "relative_increase"
                 }.get(tkind if isinstance(tkind, int) else -1, tkind)
        base = (self._metric(self.baseline, metric)
                if self.baseline is not None else m)
        if tkind == "delta":
            val = m - base
        elif tkind == "ratio":
            val = m / base if base != 0 else 0.0
        elif tkind == "relative_increase":
            val = (m - base) / base if base != 0 else 0.0
        else:
            val = m
        direction = comp.get("direction", 0)
        if direction in (1, "lower_is_worse"):
            val = -val
        scale = float(comp.get("scale", 1.0))
        target = float(comp.get("target", 0.0))
        return (val - target) * scale

    @staticmethod
    def _metric(obs: dict, metric: str) -> float:
        if obs is None:
            return 0.0
        if metric == "iterations":
            return float(obs["iters"])
        if metric == "solve_time":
            return float(obs["solve_time"])
        if metric == "setup_time":
            return float(obs.get("setup_time", 0.0))
        if metric == "total_time":
            return float(obs.get("setup_time", 0.0) + obs["solve_time"])
        if metric == "solve_overhead_vs_setup":
            st = float(obs.get("setup_time", 0.0))
            return float(obs["solve_time"] / st) if st > 0 else 0.0
        return 0.0

    def should_keep(self, ls_id: int) -> bool:
        """Whether to keep the precon alive after this solve
        (ref: main.c:221 — precon kept if reuse says so)."""
        return self.enabled

    def _sync(self, decision: bool) -> bool:
        try:
            import jax

            if jax.process_count() > 1:
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
        obs = {
            "ls_id": ls_id,
            "iters": result.iters,
            "solve_time": result.solve_time,
            "setup_time": (stats.setup_time() if stats and stats.entries
                           else 0.0),
            "converged": result.converged,
        }
        self.observations.append(obs)
        if self.baseline is None:
            self.baseline = obs
        guards = self.args.get("guards") or {}
        if not result.converged and guards.get("rebuild_on_solver_failure",
                                               True):
            self.force_rebuild = True
