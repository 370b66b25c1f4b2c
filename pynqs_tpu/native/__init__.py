"""Native (C++) host-side helpers, loaded via ctypes.

Compiled on first use with g++ (cached as libonvtools.so next to the
source).  Falls back to the pure-Python implementations in utils/fci
when no compiler is available — callers should go through
:func:`fci_space_bits`, which handles the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["available", "fci_space_bits", "pack_bits_u32"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "onv_tools.cpp")
_SO = os.path.join(_DIR, "libonvtools.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
            _SRC
        ):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        lib.n_choose_k.restype = ctypes.c_longlong
        lib.n_choose_k.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.fci_space_bits.restype = ctypes.c_longlong
        lib.fci_space_bits.argtypes = [
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_char_p,
        ]
        lib.pack_bits_u32.restype = None
        lib.pack_bits_u32.argtypes = [
            ctypes.c_char_p,
            ctypes.c_longlong,
            ctypes.c_int,
            ctypes.c_void_p,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def fci_space_bits(sorb: int, noa: int, nob: int) -> np.ndarray:
    """Native FCI-space enumeration; falls back to utils.fci."""
    norb = sorb // 2
    lib = _load()
    if lib is None or norb > 64:
        from pynqs_tpu.utils import fci

        return fci.fci_bits(sorb, noa, nob)
    n = lib.n_choose_k(norb, noa) * lib.n_choose_k(norb, nob)
    out = np.empty((n, sorb), dtype=np.int8)
    got = lib.fci_space_bits(
        norb, noa, nob, out.ctypes.data_as(ctypes.c_char_p)
    )
    if got != n:
        raise RuntimeError(f"native fci_space_bits failed ({got} != {n})")
    return out


def pack_bits_u32(bits: np.ndarray) -> np.ndarray:
    """Native host-side bit packing; falls back to numpy."""
    bits = np.ascontiguousarray(bits, dtype=np.int8)
    n, sorb = bits.shape
    nw = (sorb + 31) // 32
    lib = _load()
    if lib is None:
        out = np.zeros((n, nw), dtype=np.uint32)
        for w in range(nw):
            for j in range(min(32, sorb - 32 * w)):
                out[:, w] |= bits[:, 32 * w + j].astype(np.uint32) << j
        return out
    out = np.empty((n, nw), dtype=np.uint32)
    lib.pack_bits_u32(
        bits.ctypes.data_as(ctypes.c_char_p),
        n,
        sorb,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out
