"""Error model tests (reference analogue: tests/test_error.c)."""

import pytest

from hypredrive_tpu.core.errors import (
    ErrorCode,
    HypredrvError,
    ConfigError,
    error_code_describe,
    error_code_get,
    error_code_clear,
    error_state_describe,
    distributed_error_sync,
)


def setup_function(_):
    error_code_clear()


def test_describe_bits():
    assert error_code_describe(0) == "no error"
    assert "YAML" in error_code_describe(ErrorCode.YAML).upper()
    combo = ErrorCode.YAML | ErrorCode.FILE_NOT_FOUND
    desc = error_code_describe(combo)
    assert "YAML" in desc.upper() and "not found" in desc


def test_sticky_state():
    with pytest.raises(HypredrvError):
        raise HypredrvError("boom", ErrorCode.MATRIX)
    assert error_code_get() & ErrorCode.MATRIX
    # dedup with counts
    for _ in range(3):
        try:
            raise HypredrvError("same msg", ErrorCode.IO)
        except HypredrvError:
            pass
    desc = error_state_describe()
    assert "same msg (x3)" in desc
    error_code_clear()
    assert error_code_get() == ErrorCode.NONE


def test_config_error_collects_messages():
    exc = None
    try:
        raise ConfigError(["a: bad", "b: worse"])
    except ConfigError as e:
        exc = e
    assert exc.messages == ["a: bad", "b: worse"]
    assert exc.code & ErrorCode.YAML


def test_distributed_sync_single_process():
    assert distributed_error_sync(int(ErrorCode.SOLVER_FAILURE)) \
        & ErrorCode.SOLVER_FAILURE


def test_timestep_file_malformed_inputs_typed():
    """Every malformed timestep file produces a typed HypredrvError
    (ref: src/internal/linsys.c:3195-3292 error paths)."""
    import tempfile, os
    import hypredrive_tpu as hd
    from hypredrive_tpu.core.errors import HypredrvError

    cases = ["", "hello world\n", "0\n", "-5\n", "999999999\n0 0\n",
             "3\n0 0\n1 2\n", "1\n0 -3\n", "1\n0.5 1.5\n", "1\nfoo bar\n"]
    td = tempfile.mkdtemp()
    for k, content in enumerate(cases):
        p = os.path.join(td, f"c{k}.txt")
        open(p, "w").write(content)
        drv = hd.HypreDrive()
        try:
            with pytest.raises(HypredrvError):
                drv.input_args_from_dict({
                    "linear_system": {
                        "generate": {"kind": "laplacian_5pt", "nx": 4},
                        "rhs_mode": "ones", "timestep_filename": p},
                    "solver": "pcg",
                    "preconditioner": {"amg": {}, "reuse": {
                        "enabled": True, "per_timestep": True}}})
        finally:
            drv.destroy()
