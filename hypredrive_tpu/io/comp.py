"""Compression codecs behind one API.

Reference: src/internal/comp.c — zlib/zstd/lz4/lz4hc/blosc selected by id
or file extension.  Available here: none/zlib/zstd (+ lzma as the
high-ratio stand-in when lz4/blosc are absent — they are not in this
image; ids are preserved so containers written by the reference with
zlib/zstd decode bit-exactly).
"""

from __future__ import annotations

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


def codec_name(codec: int) -> str:
    return _NAMES.get(codec, f"unknown({codec})")


def codec_from_name(name: str) -> int:
    for k, v in _NAMES.items():
        if v == name.strip().lower():
            return k
    raise HypredrvError(f"unknown codec '{name}'", ErrorCode.INVALID_VAL)


def codec_from_filename(filename: str) -> int:
    ext = filename.rsplit(".", 1)[-1].lower()
    return _EXTS.get(ext, COMP_NONE)


def compress(codec: int, data: bytes, level: int = -1) -> bytes:
    if codec == COMP_NONE:
        return bytes(data)
    if codec == COMP_ZLIB:
        return zlib.compress(data, 6 if level < 0 else level)
    if codec == COMP_ZSTD:
        try:
            import zstandard

            return zstandard.ZstdCompressor(
                level=5 if level < 0 else level).compress(data)
        except ImportError:
            raise HypredrvError("zstandard not available",
                                ErrorCode.NOT_IMPLEMENTED)
    if codec in (COMP_LZ4, COMP_LZ4HC, COMP_BLOSC):
        raise HypredrvError(
            f"codec {codec_name(codec)} not available in this build "
            "(use none/zlib/zstd)", ErrorCode.NOT_IMPLEMENTED)
    raise HypredrvError(f"unknown codec {codec}", ErrorCode.INVALID_VAL)


def decompress(codec: int, data: bytes) -> bytes:
    if codec == COMP_NONE:
        return bytes(data)
    if codec == COMP_ZLIB:
        return zlib.decompress(data)
    if codec == COMP_ZSTD:
        try:
            import zstandard

            return zstandard.ZstdDecompressor().decompress(data)
        except ImportError:
            raise HypredrvError("zstandard not available",
                                ErrorCode.NOT_IMPLEMENTED)
    raise HypredrvError(
        f"codec {codec_name(codec)} not available in this build",
        ErrorCode.NOT_IMPLEMENTED)
