"""Process-global runtime: init/finalize and live-object registry.

Mirrors the reference runtime singleton (ref: src/internal/runtime.c:101
hypredrv_RuntimeInitialize, :232 DestroyAllLiveObjects): a once-only device
initialization plus a registry of live driver handles so ``finalize`` can
sweep leaked objects.

TPU-native mapping: instead of HYPRE_Initialize + MPI we (optionally) call
``jax.distributed.initialize`` for multi-controller runs, record the default
device mesh, and register live :class:`~hypredrive_tpu.api.HypreDrive`
objects.
"""

from __future__ import annotations

import atexit
import os
import weakref
from typing import Optional

_state = {
    "initialized": False,
    "distributed": False,
    "live": None,  # weak set of live driver objects
}


def is_initialized() -> bool:
    return _state["initialized"]


def initialize(distributed: Optional[bool] = None, **dist_kwargs):
    """Initialize the runtime (ref: HYPREDRV_Initialize, src/HYPREDRV.c:915).

    ``distributed=True`` calls ``jax.distributed.initialize`` (the
    multi-controller analogue of MPI_Init); by default it is enabled only
    when the standard cluster env vars are present.
    """
    if _state["initialized"]:
        return
    _state["live"] = weakref.WeakSet()
    # Persistent XLA compilation cache: solver cores are while_loops whose
    # first compile is expensive (tens of seconds through a remote-compile
    # tunnel); caching makes repeat CLI runs fast.
    try:
        import jax

        # partition by platform: axon/TPU executables are compiled by the
        # remote service with its host's CPU features — loading those
        # into a local-CPU process can SIGILL
        plat = os.environ.get("JAX_PLATFORMS", "default") or "default"
        cache_dir = os.path.join(
            os.environ.get(
                "HYPREDRV_CACHE_DIR",
                os.path.expanduser("~/.cache/hypredrive_tpu/jax")),
            plat.replace(",", "_"))
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:
        pass
    if distributed is None:
        distributed = bool(os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if distributed:
        import jax

        jax.distributed.initialize(**dist_kwargs)
        _state["distributed"] = True
    _state["initialized"] = True


def register_live(obj) -> None:
    if _state["live"] is None:
        _state["live"] = weakref.WeakSet()
    _state["live"].add(obj)


def unregister_live(obj) -> None:
    live = _state["live"]
    if live is not None:
        live.discard(obj)


def finalize():
    """Destroy leaked live objects and shut down
    (ref: hypredrv_RuntimeDestroyAllLiveObjects, src/internal/runtime.c:232)."""
    live = _state["live"]
    if live is not None:
        for obj in list(live):
            try:
                obj.destroy()
            except Exception:
                pass
        live.clear()
    if _state["distributed"]:
        try:
            import jax

            jax.distributed.shutdown()
        except Exception:
            pass
        _state["distributed"] = False
    _state["initialized"] = False


atexit.register(finalize)
