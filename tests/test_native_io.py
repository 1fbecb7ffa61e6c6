"""Native C++ IJ ASCII reader/writer (native/src/ij_io.cpp via ctypes).

The native layer must be bit-faithful with the numpy fallback and reject
the same malformed inputs (ref contract: src/internal/matrix.c
non-finite rejection, window validation).
"""

import numpy as np
import pytest
import scipy.sparse as sp

from hypredrive_tpu.io import ij, native
from hypredrive_tpu.core.errors import HypredrvError


pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native lib unavailable")


@pytest.fixture
def matrix():
    rng = np.random.default_rng(3)
    A = sp.random(40, 40, density=0.1, random_state=3, format="csr")
    A.setdiag(2.0)
    return A.tocsr()


def test_matrix_round_trip(tmp_path, matrix):
    path = str(tmp_path / "A.out")
    ij.write_matrix_ascii(path, matrix, ilower=5)
    A2, ilower = ij.read_matrix_ascii(path)
    assert ilower == 5
    assert np.allclose(A2.toarray(), matrix.toarray())


def test_native_matches_numpy_fallback(tmp_path, matrix):
    path = str(tmp_path / "A.out")
    ij.write_matrix_ascii(path, matrix, ilower=0)
    nat = native.read_matrix_ascii(path)
    assert nat is not None
    rows, cols, vals, il, iu, jl, ju = nat
    data = np.loadtxt(path, skiprows=1, ndmin=2)
    assert np.array_equal(rows, data[:, 0].astype(np.int64))
    assert np.array_equal(cols, data[:, 1].astype(np.int64))
    assert np.allclose(vals, data[:, 2])
    assert (il, iu, jl, ju) == (0, 39, 0, 39)


def test_vector_round_trip(tmp_path):
    v = np.linspace(-3, 9, 57)
    path = str(tmp_path / "b.out")
    ij.write_vector_ascii(path, v, ilower=2)
    v2, ilower = ij.read_vector_ascii(path)
    assert ilower == 2
    assert np.allclose(v2, v)


def test_nonfinite_rejected(tmp_path):
    path = str(tmp_path / "bad.out")
    with open(path, "w") as f:
        f.write("0 1 0 1\n0 0 1.0\n0 1 nan\n")
    with pytest.raises(HypredrvError, match="non-finite"):
        ij.read_matrix_ascii(path)


def test_malformed_entry_rejected(tmp_path):
    path = str(tmp_path / "bad2.out")
    with open(path, "w") as f:
        f.write("0 1 0 1\n0 zz 1.0\n")
    with pytest.raises(HypredrvError):
        ij.read_matrix_ascii(path)


def test_vector_window_violation(tmp_path):
    path = str(tmp_path / "bad3.out")
    with open(path, "w") as f:
        f.write("0 3\n7 1.0\n")
    with pytest.raises(HypredrvError):
        ij.read_vector_ascii(path)


def test_scientific_and_negative(tmp_path):
    path = str(tmp_path / "sci.out")
    with open(path, "w") as f:
        f.write("0 1 0 1\n0 0 -1.5e-3\n1 1 +2E+4\n")
    A, _ = ij.read_matrix_ascii(path)
    assert np.allclose(A.toarray(), [[-1.5e-3, 0], [0, 2e4]])


def test_native_gather_plan_matches_numpy():
    """The C++ planner must produce the same pass schedule as numpy."""
    import scipy.sparse as sp
    from hypredrive_tpu.io import native
    from hypredrive_tpu.ops import gather_plan as gp

    A = sp.random(3000, 2500, density=0.01, random_state=9, format="coo")
    A.data[:] = np.random.default_rng(9).standard_normal(len(A.data))
    assert native.get_lib() is not None

    nat = gp.build_plan(A.row, A.col, A.data, 3000, 2500)  # native path
    import unittest.mock as mock
    with mock.patch("hypredrive_tpu.io.native.build_gather_plan",
                    return_value=None):
        ref = gp.build_plan(A.row, A.col, A.data, 3000, 2500)

    assert nat.num_passes == ref.num_passes
    assert nat.group == ref.group
    assert np.array_equal(nat.pass_tile, ref.pass_tile)
    assert np.array_equal(nat.pass_first, ref.pass_first)
    assert np.array_equal(nat.q0, ref.q0)
    assert np.array_equal(nat.lane, ref.lane)
    assert np.allclose(nat.val, ref.val)
