"""FSAI preconditioner (placeholder — implemented in a later milestone).

Target parity: ref src/internal/fsai.c — adaptive FSAI (per-row local
least squares, embarrassingly parallel: excellent TPU fit).
"""

from __future__ import annotations

from .base import Preconditioner
from ..core.errors import HypredrvError, ErrorCode


class FSAIPrecon(Preconditioner):
    method = "fsai"
    apply_fn = None

    def setup(self, system):
        raise HypredrvError("FSAI preconditioner not yet implemented",
                            ErrorCode.NOT_IMPLEMENTED)
