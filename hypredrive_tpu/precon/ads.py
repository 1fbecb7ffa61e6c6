"""ADS — auxiliary-space divergence solver (face/Raviart-Thomas elements).

Reference: src/internal/ads.c wrapping HYPRE_ADS: needs the discrete
curl C (n_faces × n_edges), discrete gradient G (n_edges × n_nodes) and
vertex coordinates; nested AMS+AMG option groups
(ref: include/internal/ads.h:24-57).

Native construction (auxiliary-space decomposition for H(div)):

    z = S(r)  +  C · B_C⁻¹ · Cᵀ r  +  Π_RT · B_Π⁻¹ · Π_RTᵀ r

* S — ℓ1-Jacobi on the face matrix A,
* B_C — AMS-style solve on the curl space  Cᵀ A C  (edge space;
  approximated by an AMG hierarchy — the full nested-AMS variant is a
  later milestone),
* Π_RT — nodal vector interpolation built from face normals
  (approximated through C·Π_edge composition), B_Π — AMG on Πᵀ A Π.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp

from .base import Preconditioner
from ..core.errors import HypredrvError, ErrorCode
from ..ops.device_matrix import EllMatrix
from .ams import build_pi


def _ads_apply(state, r):
    """ADS shares the AMS cycle machinery: spaces are 0 = smoothing on
    the face matrix, 1 = curl (edge) space solved by a nested AMS,
    2 = Π_RT vector space (ref: ads.h cycle_type — same digit grammar
    as ams.h)."""
    from .ams import _ams_apply

    return _ams_apply(state, r)


def build_ads_state(A_host: sp.csr_matrix, C: sp.csr_matrix,
                    G: sp.csr_matrix, coords: np.ndarray, args, dtype,
                    mesh=None):
    """Construct the ADS state (an AMSState with spaces 0/1/2 =
    smoothing / nested AMS on the curl space / Π_RT).  With ``mesh``,
    every operator is a row-sharded DistEllMatrix and all hierarchies
    run the distributed setup (same composition as build_ams_state)."""
    from .amg.hierarchy import setup_hierarchy
    from ..config.sections import AMG_SCHEMA
    from .ams import AMSState

    coords = np.asarray(coords, dtype=np.float64)
    dim = coords.shape[1]
    A_host = sp.csr_matrix(A_host)
    C = sp.csr_matrix(C)

    def op(M):
        M = sp.csr_matrix(M)
        if mesh is not None:
            from ..parallel.dist_matrix import DistEllMatrix

            return DistEllMatrix.from_csr(M, mesh, dtype=dtype)
        return EllMatrix.from_csr(M, dtype=dtype)

    def vec(v):
        if mesh is not None:
            from ..parallel.dist_matrix import pad_vector

            n_sh = int(mesh.devices.size)
            n_pad = -(-len(v) // n_sh) * n_sh
            vp = np.ones(n_pad)
            vp[:len(v)] = v
            return pad_vector(vp, n_pad, mesh, dtype=dtype)
        return jnp.asarray(v, dtype)

    B_C = sp.csr_matrix(C.T @ A_host @ C)
    B_C = B_C + 1e-12 * sp.identity(B_C.shape[0])
    # face-space vector interpolation via the edge-space Π composed
    # through C (RT0 nodal interpolation approximation)
    Pi_edge = build_pi(G, coords)
    Pi = sp.csr_matrix(C @ Pi_edge)
    B_Pi = sp.csr_matrix(Pi.T @ A_host @ Pi)
    B_Pi = B_Pi + 1e-12 * sp.identity(B_Pi.shape[0])

    amg_args = args.get("amg") or AMG_SCHEMA.defaults()
    dof_func_pi = (np.arange(B_Pi.shape[0]) % dim).astype(np.int64)
    # nested AMS on the curl space (edge elements): beta_is_zero —
    # curl∘grad = 0 means the scalar-potential space is degenerate,
    # so the nested solve is smoother + Π_edge-space AMG (the hypre
    # ADS composition, ref: ads.h AMS option group)
    B_Pi_edge = sp.csr_matrix(Pi_edge.T @ B_C @ Pi_edge)
    B_Pi_edge = B_Pi_edge + 1e-12 * sp.identity(B_Pi_edge.shape[0])
    dof_func_e = (np.arange(B_Pi_edge.shape[0]) % dim).astype(np.int64)
    l1c = np.asarray(np.abs(B_C).sum(axis=1)).ravel()
    ams_sub = dict(args.get("ams") or {})
    bc_state = AMSState(
        op(B_C),
        (vec(np.where(l1c != 0, 1.0 / l1c, 1.0)),),
        None, None,
        op(Pi_edge), op(sp.csr_matrix(Pi_edge.T)),
        None,
        setup_hierarchy(B_Pi_edge, amg_args, dtype=dtype,
                        dof_func=dof_func_e, mesh=mesh),
        cycle_type=int(ams_sub.get("cycle_type", 1) or 1),
        relax_times=max(1, int(ams_sub.get("relax_times", 1) or 1)),
    )
    bpi_state = setup_hierarchy(B_Pi, amg_args, dtype=dtype,
                                dof_func=dof_func_pi, mesh=mesh)

    relax_times = max(1, int(args.get("relax_times", 1)))
    weight = float(args.get("relax_weight", 1.0))
    l1 = np.asarray(np.abs(A_host).sum(axis=1)).ravel()
    return AMSState(
        op(A_host),
        (vec(np.where(l1 != 0, weight / l1, 1.0)),),
        op(C), op(sp.csr_matrix(C.T)),
        op(Pi), op(sp.csr_matrix(Pi.T)),
        bc_state, bpi_state,
        cycle_type=int(args.get("cycle_type", 1)),
        relax_times=relax_times,
    )


class ADSPrecon(Preconditioner):
    method = "ads"
    apply_fn = staticmethod(_ads_apply)

    def setup(self, system):
        A_host = system.M_host if system.M_host is not None else system.A_host
        if A_host is None:
            A_host = system.A.to_csr()
        C = getattr(system, "C_host", None)
        G = getattr(system, "G_host", None)
        coords = getattr(system, "coords", None)
        if C is None or G is None or coords is None:
            raise HypredrvError(
                "ADS requires the discrete curl (set_discrete_curl), "
                "discrete gradient (set_discrete_gradient) and vertex "
                "coordinates (set_coordinates)",
                ErrorCode.INVALID_PRECON)
        self.state = build_ads_state(A_host, C, G, coords, self.args,
                                     system.dtype)
        self.is_setup = True
