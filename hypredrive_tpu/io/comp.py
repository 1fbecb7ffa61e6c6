"""Compression codecs behind one API.

Reference: src/internal/comp.c — zlib/zstd/lz4/lz4hc/blosc selected by id
or file extension.  Byte-format parity: every codec except ``none``
prefixes the compressed block with the uint64 original size, exactly as
``hypredrv_compress`` does (ref: comp.c:391-497), so containers written
by the reference decode here and vice versa.  lz4/lz4hc use the raw LZ4
block format via the native C++ codec (native/src/ij_io.cpp
hdrv_lz4_{compress,decompress}; clean-room implementation of the block
spec) with a pure-Python decoder fallback; blosc is not built.
"""

from __future__ import annotations

import struct
import zlib

from ..core.errors import HypredrvError, ErrorCode

COMP_NONE = 0
COMP_ZLIB = 1
COMP_ZSTD = 2
COMP_LZ4 = 3
COMP_LZ4HC = 4
COMP_BLOSC = 5

_NAMES = {COMP_NONE: "none", COMP_ZLIB: "zlib", COMP_ZSTD: "zstd",
          COMP_LZ4: "lz4", COMP_LZ4HC: "lz4hc", COMP_BLOSC: "blosc"}
_EXTS = {"zz": COMP_ZLIB, "gz": COMP_ZLIB, "zst": COMP_ZSTD,
         "lz4": COMP_LZ4, "lz4hc": COMP_LZ4HC, "blosc": COMP_BLOSC}

_SIZE = struct.Struct("<Q")        # uint64 original-size prefix


def codec_name(codec: int) -> str:
    return _NAMES.get(codec, f"unknown({codec})")


def codec_from_name(name: str) -> int:
    for k, v in _NAMES.items():
        if v == name.strip().lower():
            return k
    raise HypredrvError(f"unknown codec '{name}'", ErrorCode.INVALID_VAL)


def codec_from_filename(filename: str) -> int:
    # the reference's suffixes are ".lz4hc.bin" etc (comp.c:97-135)
    low = filename.lower()
    for ext, codec in sorted(_EXTS.items(), key=lambda kv: -len(kv[0])):
        if low.endswith(f".{ext}.bin") or low.endswith(f".{ext}"):
            return codec
    return COMP_NONE


# -- raw LZ4 block codec ------------------------------------------------------

def _lz4_native():
    try:
        from .native import get_lib

        lib = get_lib()
        if lib is not None and hasattr(lib, "hdrv_lz4_compress"):
            return lib
    except Exception:
        pass
    return None


def _lz4_block_compress(data: bytes) -> bytes:
    lib = _lz4_native()
    import numpy as np

    if lib is not None:
        import ctypes

        src = np.frombuffer(data, np.uint8)
        cap = len(data) + len(data) // 255 + 64
        dst = np.empty(cap, np.uint8)
        m = lib.hdrv_lz4_compress(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), len(data),
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), cap)
        if m > 0:
            return dst[:m].tobytes()
    # fallback: literal-only sequences (valid LZ4, no compression)
    out = bytearray()
    n = len(data)
    lit = n
    token = min(lit, 15) << 4
    out.append(token)
    if lit >= 15:
        rest = lit - 15
        while rest >= 255:
            out.append(255)
            rest -= 255
        out.append(rest)
    out += data
    return bytes(out)


def _lz4_block_decompress(data: bytes, orig_size: int) -> bytes:
    lib = _lz4_native()
    import numpy as np

    if lib is not None:
        import ctypes

        src = np.frombuffer(data, np.uint8)
        dst = np.empty(max(1, orig_size), np.uint8)
        m = lib.hdrv_lz4_decompress(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), len(data),
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), orig_size)
        if m != orig_size:
            raise HypredrvError("malformed LZ4 block", ErrorCode.IO)
        return dst[:m].tobytes()
    # pure-Python safe decoder (correctness fallback)
    out = bytearray()
    ip, n = 0, len(data)
    while ip < n:
        token = data[ip]; ip += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = data[ip]; ip += 1
                lit += b
                if b != 255:
                    break
        out += data[ip:ip + lit]; ip += lit
        if ip >= n:
            break
        offset = data[ip] | (data[ip + 1] << 8); ip += 2
        mlen = (token & 15) + 4
        if (token & 15) == 15:
            while True:
                b = data[ip]; ip += 1
                mlen += b
                if b != 255:
                    break
        if offset == 0 or offset > len(out):
            raise HypredrvError("malformed LZ4 block", ErrorCode.IO)
        for _ in range(mlen):
            out.append(out[-offset])
    if len(out) != orig_size:
        raise HypredrvError("LZ4 size mismatch", ErrorCode.IO)
    return bytes(out)


# -- public API ---------------------------------------------------------------

def compress(codec: int, data: bytes, level: int = -1) -> bytes:
    if codec == COMP_NONE:
        return bytes(data)
    prefix = _SIZE.pack(len(data))
    if codec == COMP_ZLIB:
        return prefix + zlib.compress(data, 6 if level < 0 else level)
    if codec == COMP_ZSTD:
        try:
            import zstandard

            return prefix + zstandard.ZstdCompressor(
                level=5 if level < 0 else level).compress(data)
        except ImportError:
            raise HypredrvError("zstandard not available",
                                ErrorCode.NOT_IMPLEMENTED)
    if codec in (COMP_LZ4, COMP_LZ4HC):
        # lz4hc emits the same block format (only the encoder effort
        # differs); one encoder serves both ids (ref: comp.c:258-340)
        return prefix + _lz4_block_compress(data)
    if codec == COMP_BLOSC:
        raise HypredrvError(
            "codec blosc not available in this build "
            "(use none/zlib/zstd/lz4)", ErrorCode.NOT_IMPLEMENTED)
    raise HypredrvError(f"unknown codec {codec}", ErrorCode.INVALID_VAL)


def decompress(codec: int, data: bytes) -> bytes:
    if codec == COMP_NONE:
        return bytes(data)
    if len(data) < _SIZE.size:
        raise HypredrvError("compressed blob too short", ErrorCode.IO)
    (orig_size,) = _SIZE.unpack_from(data)
    body = bytes(data[_SIZE.size:])
    if codec == COMP_ZLIB:
        out = zlib.decompress(body)
    elif codec == COMP_ZSTD:
        try:
            import zstandard

            out = zstandard.ZstdDecompressor().decompress(
                body, max_output_size=max(1, orig_size))
        except ImportError:
            raise HypredrvError("zstandard not available",
                                ErrorCode.NOT_IMPLEMENTED)
    elif codec in (COMP_LZ4, COMP_LZ4HC):
        out = _lz4_block_decompress(body, orig_size)
    else:
        raise HypredrvError(
            f"codec {codec_name(codec)} not available in this build",
            ErrorCode.NOT_IMPLEMENTED)
    if len(out) != orig_size:
        raise HypredrvError(
            f"decompressed size mismatch ({len(out)} vs {orig_size})",
            ErrorCode.IO)
    return out
