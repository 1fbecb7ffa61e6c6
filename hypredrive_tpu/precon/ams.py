"""AMS — auxiliary-space Maxwell solver (edge elements).

Reference: src/internal/ams.c wrapping HYPRE_AMS: needs the discrete
gradient G (n_edges × n_nodes) and vertex coordinates; internal α/β AMG
option groups (ref: include/internal/ams.h:24-63).

Native TPU construction (Hiptmair-Xu auxiliary-space decomposition):

    z = S(r)  +  G · B_G⁻¹ · Gᵀ r  +  Π · B_Π⁻¹ · Πᵀ r

* S — ℓ1-Jacobi smoother on the edge matrix A (VPU),
* B_G — AMG hierarchy on the scalar potential space  Gᵀ A G,
* Π — nodal vector interpolation (Π_d[e, v] = t_e[d]/2 from G's edge
  endpoints and coordinates), B_Π — AMG on the (3·n_nodes) vector space
  Πᵀ A Π (block-scalar AMG with dof_func = component index).

All three corrections are additive (AMS cycle type 1) and fuse into a
single XLA program.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp

from .base import Preconditioner
from ..core.errors import HypredrvError, ErrorCode
from ..ops.device_matrix import EllMatrix


def build_pi(G: sp.csr_matrix, coords: np.ndarray) -> sp.csr_matrix:
    """Nodal vector interpolation Π (n_edges × dim·n_nodes).

    For edge e with endpoints (i, j) (signs from G): tangent
    t_e = x_j − x_i;  Π[e, dim·v + d] = t_e[d] / 2 for v ∈ {i, j}.
    """
    G = sp.csr_matrix(G)
    n_edges, n_nodes = G.shape
    dim = coords.shape[1]
    rows, cols, vals = [], [], []
    indptr, indices, data = G.indptr, G.indices, G.data
    for e in range(n_edges):
        lo, hi = indptr[e], indptr[e + 1]
        nodes = indices[lo:hi]
        signs = data[lo:hi]
        if len(nodes) != 2:
            continue  # boundary-eliminated edge
        head = nodes[np.argmax(signs)]
        tail = nodes[np.argmin(signs)]
        t = coords[head] - coords[tail]
        for v in nodes:
            for d in range(dim):
                rows.append(e)
                cols.append(dim * v + d)
                vals.append(t[d] / 2.0)
    Pi = sp.csr_matrix((vals, (rows, cols)),
                       shape=(n_edges, dim * n_nodes))
    Pi.sort_indices()
    return Pi


def _ams_apply(state, r):
    from .amg.cycle import amg_apply

    A, d_inv, G, GT, Pi, PiT, bg_state, bpi_state, sweeps = state
    # additive corrections (AMS cycle 1)
    z = d_inv * r
    z = z + G.matvec(amg_apply(bg_state, GT.matvec(r)))
    z = z + Pi.matvec(amg_apply(bpi_state, PiT.matvec(r)))
    # one smoothing sweep to tie the spaces together
    z = z + d_inv * (r - A.matvec(z))
    return z


class AMSPrecon(Preconditioner):
    method = "ams"
    apply_fn = staticmethod(_ams_apply)

    def setup(self, system):
        A_host = system.M_host if system.M_host is not None else system.A_host
        if A_host is None:
            A_host = system.A.to_csr()
        G = getattr(system, "G_host", None)
        coords = getattr(system, "coords", None)
        if G is None or coords is None:
            # operator-completeness guard (ref: precon.c:648-707)
            raise HypredrvError(
                "AMS requires the discrete gradient (set_discrete_gradient)"
                " and vertex coordinates (set_coordinates)",
                ErrorCode.INVALID_PRECON)
        from .amg.hierarchy import setup_hierarchy
        from ..config.sections import AMG_SCHEMA

        dtype = system.dtype
        coords = np.asarray(coords, dtype=np.float64)
        dim = coords.shape[1]

        B_G = sp.csr_matrix(G.T @ A_host @ G)
        B_G = B_G + 1e-12 * sp.identity(B_G.shape[0])  # gauge regularization
        Pi = build_pi(G, coords)
        B_Pi = sp.csr_matrix(Pi.T @ A_host @ Pi)
        B_Pi = B_Pi + 1e-12 * sp.identity(B_Pi.shape[0])

        errors = []
        alpha_args = AMG_SCHEMA.parse(
            dict(self.args.get("alpha_amg") or {}), "ams:alpha", errors) \
            if isinstance(self.args.get("alpha_amg"), dict) \
            else self.args.get("alpha_amg") or AMG_SCHEMA.defaults()
        beta_args = self.args.get("beta_amg") or AMG_SCHEMA.defaults()

        dof_func_pi = (np.arange(B_Pi.shape[0]) % dim).astype(np.int64)
        bg_state = setup_hierarchy(B_G, beta_args, dtype=dtype)
        bpi_state = setup_hierarchy(B_Pi, alpha_args, dtype=dtype,
                                    dof_func=dof_func_pi)

        l1 = np.asarray(np.abs(A_host).sum(axis=1)).ravel()
        d_inv = jnp.asarray(np.where(l1 != 0, 1.0 / l1, 1.0), dtype=dtype)
        self.state = (
            EllMatrix.from_csr(A_host, dtype=dtype),
            d_inv,
            EllMatrix.from_csr(G, dtype=dtype),
            EllMatrix.from_csr(sp.csr_matrix(G.T), dtype=dtype),
            EllMatrix.from_csr(Pi, dtype=dtype),
            EllMatrix.from_csr(sp.csr_matrix(Pi.T), dtype=dtype),
            bg_state, bpi_state,
            jnp.int32(int(self.args.get("relax_times", 1))),
        )
        self.is_setup = True
