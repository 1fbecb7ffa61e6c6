"""AMS / ADS auxiliary-space preconditioners + state-vector API
(reference analogues: src/internal/ams.c, ads.c wrapping HYPRE_AMS/ADS;
state vectors src/HYPREDRV.c:1701-1930)."""

import numpy as np
import pytest
import scipy.sparse as sp

import hypredrive_tpu as hd
from hypredrive_tpu.core.errors import HypredrvError
from hypredrive_tpu.ops.csr import (
    grid_incidence_2d,
    grid_incidence_3d,
    maxwell_edge_system,
    graddiv_face_system,
)


def test_de_rham_complex():
    G, C, coords = grid_incidence_2d(6)
    assert abs(C @ G).max() == 0.0
    assert coords.shape == (36, 2)
    G3, C3, D3, coords3 = grid_incidence_3d(4)
    assert abs(C3 @ G3).max() == 0.0
    assert abs(D3 @ C3).max() == 0.0
    assert coords3.shape == (64, 3)


def _aux_solve(A, precon, setters, tol=1e-8, solver="pcg"):
    cfg = {
        "linear_system": {"rhs_mode": "randsol"},
        "solver": {solver: {"relative_tol": tol, "max_iter": 400}},
        "preconditioner": precon,
    }
    drv = hd.HypreDrive()
    try:
        drv.input_args_from_dict(cfg)
        drv.set_matrix_from_csr(A.indptr, A.indices, A.data)
        for name, val in setters.items():
            getattr(drv, name)(val)
        sys_ = drv.system
        rng = np.random.default_rng(11)
        drv.set_rhs(A @ rng.uniform(-1, 1, A.shape[0]))
        drv.precon_create()
        drv.linear_solver_create()
        drv.linear_solver_setup()
        res = drv.linear_solver_apply()
        x = drv.get_solution()
        r = np.asarray(sys_.b) - A @ x
        return res, np.linalg.norm(r) / max(np.linalg.norm(np.asarray(sys_.b)), 1e-300)
    finally:
        drv.destroy()


def test_ams_converges_2d():
    A, G, coords = maxwell_edge_system(8, eps=0.1, dim=2)
    res, rel = _aux_solve(A, "ams",
                          {"set_discrete_gradient": G,
                           "set_coordinates": coords})
    assert res.converged and rel < 1e-6
    # the curl-curl near-null space kills plain Jacobi's effectiveness:
    # AMS must converge in far fewer iterations
    res_j, _ = _aux_solve(A, "jacobi",
                          {"set_discrete_gradient": G,
                           "set_coordinates": coords})
    assert res.iters < res_j.iters


def test_ams_converges_3d():
    A, G, coords = maxwell_edge_system(4, eps=0.05, dim=3)
    res, rel = _aux_solve(A, "ams",
                          {"set_discrete_gradient": G,
                           "set_coordinates": coords})
    assert res.converged and rel < 1e-6


def test_ams_requires_operators():
    A, G, coords = maxwell_edge_system(4, dim=2)
    with pytest.raises(HypredrvError):
        _aux_solve(A, "ams", {})


def test_ads_converges():
    A, C, G, coords = graddiv_face_system(4, eps=0.1)
    res, rel = _aux_solve(A, "ads",
                          {"set_discrete_curl": C,
                           "set_discrete_gradient": G,
                           "set_coordinates": coords})
    assert res.converged and rel < 1e-6
    res_j, _ = _aux_solve(A, "jacobi",
                          {"set_discrete_curl": C,
                           "set_discrete_gradient": G,
                           "set_coordinates": coords})
    assert res.iters < res_j.iters


def test_ads_requires_operators():
    A, C, G, coords = graddiv_face_system(3)
    with pytest.raises(HypredrvError):
        _aux_solve(A, "ads", {"set_discrete_curl": C})


# -- state vectors ----------------------------------------------------------

def test_state_vectors():
    drv = hd.HypreDrive()
    try:
        u0, u1 = np.arange(4.0), np.zeros(4)
        drv.state_vector_set([u0, u1])
        assert np.array_equal(drv.state_vector_get_values(0), u0)
        drv.state_vector_copy(0, 1)
        assert np.array_equal(drv.state_vector_get_values(1), u0)
        drv.state_vector_get_values(1)[:] = 7.0
        drv.state_vector_update_all()   # circular shift: old 1 becomes 0
        assert np.all(drv.state_vector_get_values(0) == 7.0)
        with pytest.raises(HypredrvError):
            drv.state_vector_get_values(5)
    finally:
        drv.destroy()


def test_state_vector_apply_correction():
    cfg = {
        "linear_system": {"generate": {"kind": "laplacian_7pt", "nx": 4},
                          "rhs_mode": "ones"},
        "solver": "pcg",
        "preconditioner": "amg",
    }
    drv = hd.HypreDrive()
    try:
        drv.input_args_from_dict(cfg)
        s = drv.linear_system_build()
        u = np.zeros(s.num_rows)
        drv.state_vector_set([u])
        drv.precon_create()
        drv.linear_solver_create()
        drv.linear_solver_setup()
        drv.linear_solver_apply()
        drv.state_vector_apply_correction(0)
        assert np.allclose(drv.state_vector_get_values(0), drv.get_solution())
    finally:
        drv.destroy()


def test_ams_multiplicative_cycle():
    """hypre cycle grammar (ref: ams.h cycle_type): 1 = multiplicative
    01210, 2 = additive 0+1+2 — the multiplicative V-shape converges at
    least as fast as the additive cycle on the 3-D Maxwell system."""
    A, G, coords = maxwell_edge_system(5)
    res_mul, rel_mul = _aux_solve(
        A, {"ams": {"cycle_type": 1}},
        {"set_discrete_gradient": G, "set_coordinates": coords})
    res_add, rel_add = _aux_solve(
        A, {"ams": {"cycle_type": 2}},
        {"set_discrete_gradient": G, "set_coordinates": coords})
    assert rel_add < 1e-6 and rel_mul < 1e-6
    assert res_mul.iters <= res_add.iters + 2


def test_ams_cycle_types_full_table():
    """Every hypre AMS cycle type (1-8 three-level, 11-14 five-level
    with per-component Π_d spaces) converges on the Maxwell system
    (ref: ams.h cycle_type table)."""
    A, G, coords = maxwell_edge_system(5)
    iters = {}
    for ct in (1, 2, 3, 4, 5, 6, 7, 8, 11, 12, 13, 14):
        res, rel = _aux_solve(
            A, {"ams": {"cycle_type": ct}},
            {"set_discrete_gradient": G, "set_coordinates": coords})
        assert rel < 1e-6, f"cycle {ct}: rel {rel}"
        iters[ct] = res.iters
    # heavier multiplicative cycles (5/7) beat or match the basic
    # additive one
    assert iters[5] <= iters[2]
    assert iters[7] <= iters[2]


def test_ams_relaxation_options():
    """relax_times / relax_weight / Chebyshev relax_type are honored
    (ref: ams.h relax_* block)."""
    A, G, coords = maxwell_edge_system(5)
    res1, rel1 = _aux_solve(
        A, {"ams": {"cycle_type": 1, "relax_times": 1}},
        {"set_discrete_gradient": G, "set_coordinates": coords})
    res3, rel3 = _aux_solve(
        A, {"ams": {"cycle_type": 1, "relax_times": 3}},
        {"set_discrete_gradient": G, "set_coordinates": coords})
    resc, relc = _aux_solve(
        A, {"ams": {"cycle_type": 1, "relax_type": 16}},
        {"set_discrete_gradient": G, "set_coordinates": coords})
    assert rel1 < 1e-6 and rel3 < 1e-6 and relc < 1e-6
    # more smoothing sweeps never hurt the iteration count materially
    assert res3.iters <= res1.iters + 1


def test_ams_unstructured_mesh():
    """Non-tensor G: a Delaunay triangulation of random points — no
    lattice ordering, irregular vertex degrees — shakes out the
    model-problem assumptions in Π/strength (VERDICT r4 #10)."""
    from scipy.spatial import Delaunay

    rng = np.random.default_rng(9)
    pts = rng.uniform(0, 1, size=(120, 2))
    tri = Delaunay(pts)
    edges = {}
    for simplex in tri.simplices:
        for a in range(3):
            i, j = sorted((int(simplex[a]), int(simplex[(a + 1) % 3])))
            edges.setdefault((i, j), len(edges))
    rows, cols, vals = [], [], []
    for (i, j), e in edges.items():
        rows += [e, e]
        cols += [i, j]
        vals += [-1.0, 1.0]
    G = sp.csr_matrix((vals, (rows, cols)),
                      shape=(len(edges), len(pts)))
    # discrete curl from the triangles (oriented boundary sums):
    # each triangle's three edges with sign by direction agreement
    cr, cc, cv = [], [], []
    for t, simplex in enumerate(tri.simplices):
        for a in range(3):
            u, v = int(simplex[a]), int(simplex[(a + 1) % 3])
            i, j = (u, v) if u < v else (v, u)
            e = edges[(i, j)]
            cr.append(t)
            cc.append(e)
            cv.append(1.0 if (u, v) == (i, j) else -1.0)
    C = sp.csr_matrix((cv, (cr, cc)), shape=(len(tri.simplices),
                                             len(edges)))
    assert abs(C @ G).max() == 0.0          # de Rham: curl∘grad = 0
    # unstructured curl-curl + mass: near-null space = range(G)
    A = sp.csr_matrix(C.T @ C + 0.05 * sp.identity(G.shape[0]))
    res, rel = _aux_solve(
        A, {"ams": {"cycle_type": 1}},
        {"set_discrete_gradient": G, "set_coordinates": pts},
        solver="pcg")
    assert rel < 1e-6
    res_j, _ = _aux_solve(
        A, "jacobi",
        {"set_discrete_gradient": G, "set_coordinates": pts},
        solver="pcg")
    assert res.iters < res_j.iters


def test_build_pi_vectorized_matches_edges():
    """Π rows: interior edges carry t_e/2 at both endpoints; rows
    eliminated from G (fewer than 2 entries) stay zero."""
    import scipy.sparse as sp
    from hypredrive_tpu.precon.ams import build_pi

    G, C, coords = grid_incidence_2d(5)
    G = sp.csr_matrix(G, dtype=np.float64)
    Pi = build_pi(G, coords)
    n_edges = G.shape[0]
    assert Pi.shape == (n_edges, 2 * coords.shape[0])
    counts = np.diff(G.indptr)
    for e in range(0, n_edges, 7):
        lo, hi = G.indptr[e], G.indptr[e + 1]
        row = Pi[e].toarray().ravel()
        if counts[e] != 2:
            assert np.all(row == 0)
            continue
        nodes = G.indices[lo:hi]
        signs = G.data[lo:hi]
        head = nodes[np.argmax(signs)]
        tail = nodes[np.argmin(signs)]
        t = coords[head] - coords[tail]
        for v in nodes:
            assert np.allclose(row[2 * v:2 * v + 2], t / 2.0)
