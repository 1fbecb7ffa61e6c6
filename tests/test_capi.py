"""C API shim test: compile and run the embedded-interpreter example.

Mirrors the reference's language-interface test tier (ref:
interfaces/cpp/tests, interfaces/fortran/tests — each binding runs a
small lifecycle + solve + failure-path program).
"""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(REPO, "native")
LIB = os.path.join(NATIVE, "libhypredrv_tpu.so")


@pytest.mark.skipif(shutil.which("gcc") is None, reason="no C compiler")
def test_c_example_lifecycle(tmp_path):
    if not os.path.exists(LIB):
        r = subprocess.run(["make", "-C", NATIVE, "libhypredrv_tpu.so"],
                           capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip(f"cannot build C shim: {r.stderr[-400:]}")

    exe = str(tmp_path / "ex_c")
    r = subprocess.run(
        ["gcc", os.path.join(REPO, "interfaces", "c", "example_laplacian.c"),
         "-L" + NATIVE, "-lhypredrv_tpu", "-I" + os.path.join(NATIVE, "include"),
         "-o", exe], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr

    env = dict(os.environ)
    env["LD_LIBRARY_PATH"] = NATIVE + ":/usr/local/lib:" + \
        env.get("LD_LIBRARY_PATH", "")
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([exe], capture_output=True, text=True, env=env,
                       timeout=300, cwd=REPO)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "PASSED" in r.stdout
    assert "bad-config rc=" in r.stdout  # typed failure path exercised
