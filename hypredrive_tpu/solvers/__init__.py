"""Krylov solvers: PCG, GMRES(m), FGMRES, BiCGSTAB.

Reference equivalent: the solver vtable dispatch (ref: src/internal/
solver.c:104-125) over hypre's ParCSR Krylov methods.  Here each method is
a jit-compiled ``lax.while_loop`` over closures (matvec, preconditioner
apply), shared between single-chip and sharded execution.
"""

from .base import Solver, SolveResult, create_solver

__all__ = ["Solver", "SolveResult", "create_solver"]
