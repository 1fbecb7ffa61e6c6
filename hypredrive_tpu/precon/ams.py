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

    Fully vectorized over the edge list (general FEM meshes hand G with
    millions of edges — the per-edge Python loop of the first version
    was the "model-problem-grade plumbing" limitation).  Rows without
    exactly one +1/−1 endpoint pair (boundary-eliminated edges) stay
    zero, as before.
    """
    G = sp.csr_matrix(G)
    G.sort_indices()
    n_edges, n_nodes = G.shape
    dim = coords.shape[1]
    counts = np.diff(G.indptr)
    rows_e = np.repeat(np.arange(n_edges), counts)
    nodes = G.indices.astype(np.int64)
    signs = G.data

    # per-edge tangent t_e = Σ_v sign(e,v) · x_v — for interior edges
    # (one +1, one −1) this is x_head − x_tail
    t = np.zeros((n_edges, dim))
    np.add.at(t, rows_e, signs[:, None] * coords[nodes])
    t[counts != 2] = 0.0                   # eliminated edges: no entry

    # Π entries: one (edge, dim·node + d) entry of t_e[d]/2 per
    # (G entry, component)
    pr = np.repeat(rows_e, dim)
    pc = (nodes[:, None] * dim + np.arange(dim)[None, :]).reshape(-1)
    pv = (t[rows_e] / 2.0).reshape(-1)
    Pi = sp.csr_matrix((pv, (pr, pc)), shape=(n_edges, dim * n_nodes))
    Pi.eliminate_zeros()
    Pi.sort_indices()
    return Pi


import jax


@jax.tree_util.register_pytree_node_class
class AMSState:
    """Pytree for the AMS apply; ``cycle_type`` is static aux so the
    jitted apply specializes on the cycle shape (ref: ams.h cycle_type —
    1 = additive, ≥2 = multiplicative)."""

    def __init__(self, A, d_inv, G, GT, Pi, PiT, bg_state, bpi_state,
                 cycle_type=1):
        (self.A, self.d_inv, self.G, self.GT, self.Pi, self.PiT,
         self.bg_state, self.bpi_state) = (A, d_inv, G, GT, Pi, PiT,
                                           bg_state, bpi_state)
        self.cycle_type = int(cycle_type)

    def tree_flatten(self):
        return ((self.A, self.d_inv, self.G, self.GT, self.Pi, self.PiT,
                 self.bg_state, self.bpi_state), (self.cycle_type,))

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch, cycle_type=aux[0])


def _ams_apply(state, r):
    from .amg.cycle import amg_apply

    if isinstance(state, tuple):      # legacy tuple state
        A, d_inv, G, GT, Pi, PiT, bg_state, bpi_state = state[:8]
        cycle = 1
    else:
        A, d_inv, G, GT, Pi, PiT = (state.A, state.d_inv, state.G,
                                    state.GT, state.Pi, state.PiT)
        bg_state, bpi_state = state.bg_state, state.bpi_state
        cycle = state.cycle_type
    # bg_state None = hypre's beta_is_zero mode (SetBetaPoissonMatrix
    # NULL, ref ams.h): the scalar-potential correction is skipped —
    # also how the nested AMS inside ADS works, where curl∘grad = 0
    # makes the gradient space degenerate
    if cycle <= 1:
        # additive corrections (AMS cycle 1: smoother ∥ G-space ∥ Π-space)
        z = d_inv * r
        if bg_state is not None:
            z = z + G.matvec(amg_apply(bg_state, GT.matvec(r)))
        z = z + Pi.matvec(amg_apply(bpi_state, PiT.matvec(r)))
        # one smoothing sweep to tie the spaces together
        z = z + d_inv * (r - A.matvec(z))
        return z
    # multiplicative cycle (ref ams.h cycle_type 2+: relax → Π-space →
    # G-space corrections, each against the UPDATED residual, then a
    # closing relaxation — the Hiptmair-Xu V-shape)
    z = d_inv * r
    res = r - A.matvec(z)
    z = z + Pi.matvec(amg_apply(bpi_state, PiT.matvec(res)))
    if bg_state is not None:
        res = r - A.matvec(z)
        z = z + G.matvec(amg_apply(bg_state, GT.matvec(res)))
    res = r - A.matvec(z)
    z = z + d_inv * res
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
        self.state = AMSState(
            EllMatrix.from_csr(A_host, dtype=dtype),
            d_inv,
            EllMatrix.from_csr(G, dtype=dtype),
            EllMatrix.from_csr(sp.csr_matrix(G.T), dtype=dtype),
            EllMatrix.from_csr(Pi, dtype=dtype),
            EllMatrix.from_csr(sp.csr_matrix(Pi.T), dtype=dtype),
            bg_state, bpi_state,
            cycle_type=int(self.args.get("cycle_type", 1)),
        )
        self.is_setup = True
