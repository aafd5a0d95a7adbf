"""CRC32-C (Castagnoli) with the TFRecord masking scheme.

TFRecord framing (reference delegates to TF's C++ RecordReader/RecordWriter):
    uint64 length | uint32 masked_crc32c(length) | bytes data |
    uint32 masked_crc32c(data)

This is a dependency-free implementation used by the fixture writer and the
pure-Python fallback reader; the C++ fast path (cpp/yt8m_io.cc) has its own.
"""

from __future__ import annotations

import struct

_POLY = 0x82F63B78  # reversed Castagnoli polynomial

_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ _POLY if _c & 1 else _c >> 1
    _TABLE.append(_c)

_MASK_DELTA = 0xA282EAD8


def crc32c(data: bytes, crc: int = 0) -> int:
    crc ^= 0xFFFFFFFF
    table = _TABLE
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


# Native fast path: the C++ reader library exports its SSE4.2/table
# crc32c (cpp/yt8m_io.cc :: yt8m_masked_crc32c). The pure-Python table
# loop above stays as the dependency-free fallback (and the oracle the
# native path is tested against).
_NATIVE = None


def _native_masked_crc():
    global _NATIVE
    if _NATIVE is None:
        _NATIVE = False
        try:
            import ctypes

            # Reuse the pipeline's loader: it rebuilds build/libyt8m_io.so
            # when it is older than cpp/yt8m_io.cc, so a stale .so can't
            # silently drop us to the slow path (or worse, get used).
            from yt8m_tpu.data.pipeline import get_native_lib

            lib = get_native_lib()
            if lib is not None:
                fn = lib.yt8m_masked_crc32c
                fn.restype = ctypes.c_uint32
                fn.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
                _NATIVE = fn
        except Exception:
            _NATIVE = False
    return _NATIVE


def masked_crc32c(data: bytes) -> int:
    fn = _native_masked_crc()
    if fn:
        return int(fn(data, len(data)))
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + _MASK_DELTA) & 0xFFFFFFFF


def unmask_crc(masked: int) -> int:
    rot = (masked - _MASK_DELTA) & 0xFFFFFFFF
    return ((rot >> 17) | (rot << 15)) & 0xFFFFFFFF


def masked_crc_bytes(data: bytes) -> bytes:
    return struct.pack("<I", masked_crc32c(data))
