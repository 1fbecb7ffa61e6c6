"""Schwarz preconditioner (placeholder — implemented in a later milestone).

Target parity: ref src/internal/schwarz.c — additive/RAS with local
ILU/dense solves per subdomain block.
"""

from __future__ import annotations

from .base import Preconditioner
from ..core.errors import HypredrvError, ErrorCode


class SchwarzPrecon(Preconditioner):
    method = "schwarz"
    apply_fn = None

    def setup(self, system):
        raise HypredrvError("Schwarz preconditioner not yet implemented",
                            ErrorCode.NOT_IMPLEMENTED)
