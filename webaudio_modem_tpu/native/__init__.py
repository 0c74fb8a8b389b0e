"""Native (C++) runtime components, loaded via ctypes.

Build with ``make -C native`` (repo root) or let this module build
lazily on first import (g++, ~1 s).  Everything degrades gracefully:
pure-Python fallbacks exist for all native paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_LIB_NAME = "libmodem_native.so"
_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(os.path.dirname(os.path.dirname(_PKG_DIR)),
                    "native", "modem_native.cpp")

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _build() -> Optional[str]:
    target = os.path.join(_PKG_DIR, _LIB_NAME)
    if not os.path.exists(_SRC):
        return None
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-std=c++17", "-shared", "-o",
             target, _SRC],
            check=True, capture_output=True, timeout=120)
        return target
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    target = os.path.join(_PKG_DIR, _LIB_NAME)
    if not os.path.exists(target):
        target = _build()
    if target is None or not os.path.exists(target):
        return None
    try:
        lib = ctypes.CDLL(target)
    except OSError:
        return None
    lib.wam_crc16.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    lib.wam_crc16.restype = ctypes.c_uint16
    lib.wam_crc16_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_uint16)]
    lib.wam_crc16_batch.restype = None
    lib.wam_deframer_new.argtypes = [ctypes.c_int]
    lib.wam_deframer_new.restype = ctypes.c_void_p
    lib.wam_deframer_free.argtypes = [ctypes.c_void_p]
    lib.wam_deframer_push.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_size_t]
    lib.wam_deframer_pending.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.wam_deframer_pending.restype = ctypes.c_size_t
    lib.wam_deframer_reset.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.wam_deframer_poll.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8)]
    lib.wam_deframer_poll.restype = ctypes.c_int
    lib.wam_deframer_total_pending.argtypes = [ctypes.c_void_p]
    lib.wam_deframer_total_pending.restype = ctypes.c_size_t
    lib.wam_deframer_drain.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
        ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_size_t,
        ctypes.c_void_p, ctypes.c_size_t]
    lib.wam_deframer_drain.restype = ctypes.c_int
    _lib = lib
    return _lib
