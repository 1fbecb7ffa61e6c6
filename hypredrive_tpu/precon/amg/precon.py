"""AMG preconditioner class (placeholder — filled in the AMG milestone)."""

from __future__ import annotations

from ..base import Preconditioner
from ...core.errors import HypredrvError, ErrorCode


class AMGPrecon(Preconditioner):
    method = "amg"
    apply_fn = None

    def setup(self, system):
        raise HypredrvError("AMG preconditioner not yet implemented",
                            ErrorCode.NOT_IMPLEMENTED)
