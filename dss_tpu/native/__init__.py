"""ctypes binding over the native host kernels (libdssnative.so).

Builds the shared library on first use (``make`` in this directory) and
falls back to pure-numpy implementations when no compiler is available —
callers never need to care.  See codec.cpp for the layout contract.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

logger = logging.getLogger("dss_tpu.native")

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libdssnative.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _HERE], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:
            logger.info(f"native build unavailable ({e}); using numpy fallback")
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.dss_pack_packet.restype = ctypes.c_int64
        lib.dss_pack_packet.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.dss_packet_header.restype = ctypes.c_int32
        lib.dss_packet_header.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.dss_unpack_packet.restype = ctypes.c_int32
        lib.dss_unpack_packet.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.dss_float_to_pcm16.restype = None
        lib.dss_float_to_pcm16.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int16),
        ]
        _lib = lib
    except OSError as e:
        logger.info(f"native load failed ({e}); using numpy fallback")
    return _lib


def available() -> bool:
    return _load() is not None


HEADER_SIZE = 7


def pack_packet(data: np.ndarray) -> bytes:
    """Sample-major float32 [samples, channels] -> GenericSignal packet."""
    data = np.ascontiguousarray(data, np.float32)
    n_samples, n_channels = data.shape
    lib = _load()
    if lib is None:
        import struct

        header = struct.pack("=BBB HH", 4, 1, 2, n_channels, n_samples)
        return header + data.T.astype(np.float32).tobytes()
    out = np.empty(HEADER_SIZE + data.size * 4, np.uint8)
    n = lib.dss_pack_packet(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_channels, n_samples,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out[:n].tobytes()


def unpack_packet(buf: bytes) -> np.ndarray:
    """GenericSignal packet -> float64 [samples, channels]."""
    raw = np.frombuffer(buf, np.uint8)
    lib = _load()
    if lib is None:
        import struct

        _d, _s, _t, ch, sa = struct.unpack("=BBB HH", buf[:HEADER_SIZE])
        payload = np.frombuffer(buf[HEADER_SIZE:], np.float32)
        return payload.reshape(ch, sa).T.astype(np.float64, order="C")
    ch = ctypes.c_int32()
    sa = ctypes.c_int32()
    if lib.dss_packet_header(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(raw),
        ctypes.byref(ch), ctypes.byref(sa),
    ) != 0:
        raise ValueError("malformed BCI2000 packet")
    out = np.empty((sa.value, ch.value), np.float64)
    lib.dss_unpack_packet(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(raw),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out


def float_to_pcm16(x: np.ndarray) -> np.ndarray:
    x = np.ascontiguousarray(x, np.float32)
    lib = _load()
    if lib is None:
        return np.clip(np.round(x * 32767.0), -32768, 32767).astype(np.int16)
    out = np.empty(x.shape, np.int16)
    lib.dss_float_to_pcm16(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
    )
    return out
