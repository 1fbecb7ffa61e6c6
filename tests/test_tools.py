"""Offline-tool tests (reference analogue: utils/mat2ijbin.c,
utils/lsseq_driver.c)."""

import numpy as np
import pytest
import scipy.sparse as sp

from hypredrive_tpu.io.ij import (read_matrix_auto, read_vector_auto,
                                  write_matrix_ascii, write_vector_ascii)
from hypredrive_tpu.tools import lsseq as lsseq_cli
from hypredrive_tpu.tools import mat2ijbin


def _mk_seq(tmp_path, n=40, count=3):
    rng = np.random.default_rng(5)
    A = sp.csr_matrix(sp.random(n, n, 0.1, random_state=2) + sp.identity(n))
    mats, rhss = [], []
    for i in range(count):
        B = A.copy()
        B.data = B.data * (1.0 + 0.1 * i)
        mp = tmp_path / f"IJ.A.{i:05d}"
        rp = tmp_path / f"IJ.b.{i:05d}"
        write_matrix_ascii(str(mp), B)
        write_vector_ascii(str(rp), rng.uniform(-1, 1, n))
        mats.append(B)
    return A, mats


def test_lsseq_pack_unpack_roundtrip(tmp_path):
    A, mats = _mk_seq(tmp_path)
    out = tmp_path / "seq.lsseq"
    rc = lsseq_cli.main(["pack", str(out), "-m",
                         str(tmp_path / "IJ.A.%05d"),
                         "-r", str(tmp_path / "IJ.b.%05d"),
                         "--codec", "zlib", "--parts", "2",
                         "--info", "case=unit"])
    assert rc == 0 and out.exists()
    rc = lsseq_cli.main(["inspect", str(out), "-v"])
    assert rc == 0
    outdir = tmp_path / "unpacked"
    rc = lsseq_cli.main(["unpack", str(out), str(outdir)])
    assert rc == 0
    for i, B in enumerate(mats):
        R, _ = read_matrix_auto(str(outdir / f"IJ.out.A.{i:05d}"))
        assert abs(R - B).max() < 1e-14
        b = read_vector_auto(str(outdir / f"IJ.out.b.{i:05d}"))
        assert len(b) == B.shape[0]


def test_lsseq_pack_no_match(tmp_path):
    rc = lsseq_cli.main(["pack", str(tmp_path / "x.lsseq"),
                         "-m", str(tmp_path / "missing.%05d")])
    assert rc == 1


def test_mat2ijbin_symmetric_expansion(tmp_path):
    A = sp.csr_matrix(sp.random(30, 30, 0.15, random_state=3))
    A = sp.csr_matrix(A + A.T + 30 * sp.identity(30))
    tri = sp.tril(A).tocoo()
    coo = tmp_path / "coo.txt"
    with open(coo, "w") as f:
        f.write("% comment line\n")
        for r, c, v in zip(tri.row, tri.col, tri.data):
            f.write(f"{r} {c} {v}\n")
    rc = mat2ijbin.main([str(coo), str(tmp_path / "out.A"),
                         "--parts", "2", "--symmetric"])
    assert rc == 0
    R, _ = read_matrix_auto(str(tmp_path / "out.A"))
    assert abs(R - A).max() < 1e-12


def test_mat2ijbin_mtx_header(tmp_path):
    mtx = tmp_path / "m.mtx"
    with open(mtx, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real symmetric\n")
        f.write("3 3 4\n1 1 4.0\n2 2 4.0\n3 3 4.0\n2 1 -1.0\n")
    rc = mat2ijbin.main([str(mtx), str(tmp_path / "m.A")])
    assert rc == 0
    R, _ = read_matrix_auto(str(tmp_path / "m.A"))
    expect = np.array([[4, -1, 0], [-1, 4, 0], [0, 0, 4.0]])
    assert np.allclose(R.toarray(), expect)


def test_mat2ijbin_rejects_nonfinite(tmp_path):
    coo = tmp_path / "bad.txt"
    coo.write_text("0 0 nan\n1 1 1.0\n")
    with pytest.raises(ValueError):
        mat2ijbin.convert(str(coo), str(tmp_path / "bad.A"))


def test_mat2ijbin_rejects_oob(tmp_path):
    coo = tmp_path / "oob.mtx"
    coo.write_text("%%MatrixMarket matrix coordinate real general\n"
                   "2 2 2\n1 1 1.0\n5 1 2.0\n")
    with pytest.raises(ValueError):
        mat2ijbin.convert(str(coo), str(tmp_path / "oob.A"))
