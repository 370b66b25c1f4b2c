"""Host-side determinant-space generation (numpy).

TPU-native analog of the reference's Fock/FCI-space helpers
(utils/public_function.py:264-341 `get_special_space`/`get_fock_space`).
Spaces are generated once on host as unpacked bit arrays and moved to
device as static operands.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np

__all__ = ["fci_bits", "fock_bits", "hf_index"]


def fci_bits(sorb: int, noa: int, nob: int) -> np.ndarray:
    """All (noa, nob) determinants as unpacked bits [n_fci, sorb] int8.

    Even bits = alpha, odd = beta.  Ordered ascending by the packed
    little-endian integer value, matching the reference's sorted ONV
    order (so LUT binary search works on either representation).

    Uses the native C++ enumerator (pynqs_tpu.native) when the space
    is big enough to matter and a toolchain is available.
    """
    norb = sorb // 2
    from math import comb

    if comb(norb, noa) * comb(norb, nob) > 4096 and norb <= 64:
        try:
            from pynqs_tpu import native

            if native.available():
                return native.fci_space_bits(sorb, noa, nob)
        except Exception:
            pass
    dets = []
    for occ_a in combinations(range(norb), noa):
        da = sum(1 << (2 * i) for i in occ_a)
        for occ_b in combinations(range(norb), nob):
            db = sum(1 << (2 * i + 1) for i in occ_b)
            dets.append(da | db)
    dets.sort()
    out = np.zeros((len(dets), sorb), dtype=np.int8)
    for r, d in enumerate(dets):
        for s in range(sorb):
            out[r, s] = (d >> s) & 1
    return out


def fock_bits(sorb: int) -> np.ndarray:
    """Full Fock space (2^sorb determinants) — tiny systems only."""
    n = 1 << sorb
    ar = np.arange(n, dtype=np.uint64)[:, None]
    return ((ar >> np.arange(sorb, dtype=np.uint64)[None, :]) & 1).astype(np.int8)


def hf_index(space_bits: np.ndarray, noa: int, nob: int) -> int:
    """Index of the aufbau HF determinant inside a bit-space array."""
    sorb = space_bits.shape[1]
    hf = np.zeros(sorb, dtype=np.int8)
    hf[0 : 2 * noa : 2] = 1
    hf[1 : 2 * nob : 2] = 1
    hit = np.nonzero((space_bits == hf).all(1))[0]
    if hit.size != 1:
        raise ValueError("HF determinant not found in space")
    return int(hit[0])
