"""MGR preconditioner (placeholder — implemented in a later milestone).

Target parity: ref src/internal/mgr.c — dofmap-driven multilevel reduction
with composable F/G-relax and coarsest solvers.
"""

from __future__ import annotations

from .base import Preconditioner
from ..core.errors import HypredrvError, ErrorCode


class MGRPrecon(Preconditioner):
    method = "mgr"
    apply_fn = None

    def setup(self, system):
        raise HypredrvError("MGR preconditioner not yet implemented",
                            ErrorCode.NOT_IMPLEMENTED)
