"""Preconditioners: AMG, MGR, ILU, FSAI, Schwarz, Chebyshev, Jacobi.

Reference equivalent: precon create/setup/apply dispatch
(ref: src/internal/precon.c:461-563, include/internal/precon.h:103-140).
"""

from .base import Preconditioner, create_precon

__all__ = ["Preconditioner", "create_precon"]
