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
