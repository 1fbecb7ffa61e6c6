"""AMG preconditioner: the BoomerAMG-equivalent.

Config surface: AMG_SCHEMA (coarsening/interpolation/aggressive/
relaxation/smoother sections; ref: src/internal/amg.c arg structs).
Setup builds the hierarchy on host (strength → PMIS → ext+i → RAP);
apply runs jitted V/W cycles on device.

RBM support (elasticity): near-null-space vectors set via the API are
folded into interpolation by minimum-norm weight correction
(precon/amg/rbm.py; ref: amg.c:602 AMGSetRBMs / interp_vec_variant),
on top of the num_functions/dof_func unknown-based coarsening path.
"""

from __future__ import annotations

import numpy as np

from ..base import Preconditioner
from ...core.logging import log
from .hierarchy import setup_hierarchy, hierarchy_summary
from .cycle import amg_apply


class AMGPrecon(Preconditioner):
    method = "amg"
    apply_fn = staticmethod(amg_apply)

    def setup(self, system):
        A_host = system.M_host if system.M_host is not None else system.A_host
        if A_host is None:
            A_host = system.A.to_csr()
        dof_func = None
        if int(self.args.coarsening.num_functions) > 1 \
                and system.dofmap is not None:
            dof_func = np.asarray(system.dofmap)
        import jax
        import contextlib

        ctx = (jax.default_device(system.device)
               if getattr(system, "device", None) is not None
               else contextlib.nullcontext())
        # the finest level reuses the solver's device matrix when the
        # preconditioner operates on A itself (M_host None => M = A)
        fine = system.A if system.M_host is None else None
        with ctx:
            self.state = setup_hierarchy(
                A_host, self.args, dtype=system.dtype, dof_func=dof_func,
                interp_vectors=getattr(system, "near_nullspace", None),
                fine_matrix=fine)
        log(2, hierarchy_summary(self.state))
        self.is_setup = True
