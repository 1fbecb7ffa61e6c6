"""Device matrix + generators + IJ I/O tests (reference analogues:
tests/test_matrix.c, test_vector.c)."""

import numpy as np
import pytest
import scipy.sparse as sp
import jax.numpy as jnp

from hypredrive_tpu.ops.csr import (
    laplacian_3d_7pt,
    laplacian_3d_27pt,
    laplacian_2d_5pt,
    elasticity_3d,
    multiphysics_block_system,
    row_partition,
)
from hypredrive_tpu.ops.device_matrix import EllMatrix
from hypredrive_tpu.io import ij


def test_ps3d10pt7_shape():
    """Exact parity with the reference dataset (BASELINE ex1)."""
    A = laplacian_3d_7pt(10)
    assert A.shape == (1000, 1000)
    assert A.nnz == 6400
    # SPD sanity
    assert (A != A.T).nnz == 0
    assert np.all(A.diagonal() == 6.0)


def test_other_generators():
    A = laplacian_2d_5pt(8)
    assert A.shape == (64, 64)
    A27 = laplacian_3d_27pt(4)
    assert A27.shape == (64, 64)
    assert np.all(A27.diagonal() == 26.0)  # 27 − self
    Ae, coords = elasticity_3d(2)
    assert Ae.shape[0] == coords.shape[0]
    assert (abs(Ae - Ae.T) > 1e-12).nnz == 0
    Am, dofmap = multiphysics_block_system(50, 3)
    assert Am.shape == (150, 150)
    assert list(dofmap[:6]) == [0, 1, 2, 0, 1, 2]


@pytest.mark.parametrize("k_cap", [64, 4])
def test_ell_matvec_matches_scipy(rng, k_cap):
    """ELL+COO-tail SpMV == scipy (tail path exercised with k_cap=4)."""
    A = sp.random(73, 73, density=0.12, random_state=42, format="csr")
    A = A + sp.identity(73)
    E = EllMatrix.from_csr(A, k_cap=k_cap)
    x = rng.standard_normal(73)
    np.testing.assert_allclose(
        np.asarray(E.matvec(jnp.asarray(x))), A @ x, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(E.diagonal()), A.diagonal(),
                               rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(E.row_l1_norms()),
        np.abs(A).sum(axis=1).A1 if hasattr(np.abs(A).sum(axis=1), "A1")
        else np.asarray(np.abs(A).sum(axis=1)).ravel(),
        rtol=1e-12)


def test_ell_round_trip():
    A = laplacian_3d_7pt(5)
    E = EllMatrix.from_csr(A)
    B = E.to_csr()
    assert (abs(A - B) > 1e-14).nnz == 0


def test_ij_ascii_round_trip(tmp_path):
    A = laplacian_2d_5pt(6)
    path = str(tmp_path / "IJ.out.A")
    ij.write_matrix_ascii(path, A)
    B, ilower = ij.read_matrix_ascii(path)
    assert ilower == 0
    assert (abs(A - B) > 1e-12).nnz == 0

    v = np.linspace(0, 1, 36)
    vpath = str(tmp_path / "IJ.out.b")
    ij.write_vector_ascii(vpath, v)
    w, _ = ij.read_vector_ascii(vpath)
    np.testing.assert_allclose(v, w, rtol=1e-12)


def test_ij_binary_multipart_round_trip(tmp_path):
    """Multipart binary format parity (ref: matrix.c 11×uint64 header)."""
    A = laplacian_3d_7pt(6)
    prefix = str(tmp_path / "IJ.out.A")
    ij.write_matrix_multipart(prefix, A, n_parts=4)
    parts = ij.find_parts(prefix)
    assert len(parts) == 4
    # header spot-check on part 0
    rows, cols, vals, meta = ij.read_matrix_binary_part(parts[0])
    assert meta["global_nrows"] == 216
    assert meta["row_lower"] == 0
    B, _ = ij.read_matrix_auto(prefix)
    assert (abs(A - B) > 1e-14).nnz == 0

    v = np.arange(216, dtype=np.float64)
    vprefix = str(tmp_path / "IJ.out.b")
    ij.write_vector_multipart(vprefix, v, n_parts=4)
    w = ij.read_vector_auto(vprefix)
    np.testing.assert_allclose(v, w)


def test_ij_nonfinite_rejected(tmp_path):
    from hypredrive_tpu.core.errors import HypredrvError

    path = str(tmp_path / "bad.A")
    with open(path, "w") as f:
        f.write("0 1 0 1\n0 0 1.0\n0 1 nan\n1 1 2.0\n")
    with pytest.raises(HypredrvError, match="non-finite"):
        ij.read_matrix_ascii(path)


def test_ij_truncated_binary(tmp_path):
    from hypredrive_tpu.core.errors import HypredrvError

    path = str(tmp_path / "trunc.bin")
    header = np.array([1, 8, 8, 10, 10, 30, 30, 0, 9, 0, 9], dtype=np.uint64)
    with open(path, "wb") as f:
        header.tofile(f)
        np.zeros(5, dtype=np.int64).tofile(f)  # far too short
    with pytest.raises(HypredrvError, match="truncated"):
        ij.read_matrix_binary_part(path)


def test_row_partition():
    off = row_partition(10, 3)
    assert list(off) == [0, 4, 7, 10]
    off = row_partition(8, 4)
    assert list(off) == [0, 2, 4, 6, 8]


def test_dense_small_operator_layout(rng):
    """Tiny operators (coarse AMG levels) stored dense: every kernel
    matches the sparse formulation (layout='dense' forces the path the
    accelerator backends take automatically under DENSE_MAX_ELEMENTS)."""
    A = sp.random(90, 90, density=0.2, random_state=7, format="csr")
    A = sp.csr_matrix(A + sp.identity(90))
    E = EllMatrix.from_csr(A, layout="dense")
    assert E.dense is not None and not E.has_ell and not E.has_tail
    x = rng.standard_normal(90)
    np.testing.assert_allclose(np.asarray(E.matvec(jnp.asarray(x))),
                               A @ x, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(E.diagonal()), A.diagonal(),
                               rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(E.row_l1_norms()),
        np.asarray(np.abs(A).sum(axis=1)).ravel(), rtol=1e-12)
    sl = rng.uniform(0.5, 2.0, 90)
    sr = rng.uniform(0.5, 2.0, 90)
    Es = E.scale(jnp.asarray(sl), jnp.asarray(sr))
    As = sp.csr_matrix(sp.diags(sl) @ A @ sp.diags(sr))
    np.testing.assert_allclose(np.asarray(Es.matvec(jnp.asarray(x))),
                               As @ x, rtol=1e-12)
    B = E.to_csr()
    assert (abs(A - B) > 1e-14).nnz == 0
    # rectangular (P-like) dense operators work too
    P = sp.random(90, 24, density=0.3, random_state=8, format="csr")
    Ep = EllMatrix.from_csr(sp.csr_matrix(P), layout="dense")
    y = rng.standard_normal(24)
    np.testing.assert_allclose(np.asarray(Ep.matvec(jnp.asarray(y))),
                               P @ y, rtol=1e-12)
