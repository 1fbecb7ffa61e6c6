"""Device mesh helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROWS_AXIS = "rows"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the row axis (the reference's only parallel axis is
    matrix rows; ref: SURVEY §2.9)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (ROWS_AXIS,))


def rows_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(ROWS_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
