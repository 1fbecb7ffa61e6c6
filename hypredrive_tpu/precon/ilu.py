"""ILU preconditioners (placeholder — implemented in a later milestone).

Target parity: ref src/internal/ilu.c — bj-ilu0/iluk/ilut with
Jacobi-iteration triangular solves (the reference's own device-friendly
switch: tri_solve off + lower/upper_jac_iters).
"""

from __future__ import annotations

from .base import Preconditioner
from ..core.errors import HypredrvError, ErrorCode


class ILUPrecon(Preconditioner):
    method = "ilu"
    apply_fn = None

    def setup(self, system):
        raise HypredrvError("ILU preconditioner not yet implemented",
                            ErrorCode.NOT_IMPLEMENTED)
