"""Independent brute-force second-quantization oracle.

Builds dense Hamiltonians by explicitly applying creation/annihilation
operators to integer-bitmask determinants:

    H = sum_pq h1e[p,q] a+_p a_q
      + 1/4 sum_pqrs <pq||rs> a+_p a+_q a_s a_r

This shares *no* code with pynqs_tpu's Slater–Condon kernels (no
excitation tables, no parity tricks) and serves as the ground-truth
for matrix elements, local energies and FCI energies in the tests.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np


def popcount_below(det: int, p: int) -> int:
    return bin(det & ((1 << p) - 1)).count("1")


def ann(det: int, p: int):
    """Apply a_p. Returns (det', phase) or None."""
    if not (det >> p) & 1:
        return None
    phase = (-1) ** popcount_below(det, p)
    return det & ~(1 << p), phase


def cre(det: int, p: int):
    """Apply a+_p. Returns (det', phase) or None."""
    if (det >> p) & 1:
        return None
    phase = (-1) ** popcount_below(det, p)
    return det | (1 << p), phase


def fci_space(sorb: int, noa: int, nob: int) -> list[int]:
    """All determinants with noa alpha (even bits) / nob beta (odd bits).

    Ordered lexicographically as integers (ascending).
    """
    norb = sorb // 2
    dets = []
    for occ_a in combinations(range(norb), noa):
        da = sum(1 << (2 * i) for i in occ_a)
        for occ_b in combinations(range(norb), nob):
            db = sum(1 << (2 * i + 1) for i in occ_b)
            dets.append(da | db)
    return sorted(dets)


def apply_h(det: int, h1e: np.ndarray, h2e_dense: np.ndarray) -> dict[int, float]:
    """H|det> as {det': amplitude} via explicit operator application."""
    sorb = h1e.shape[0]
    out: dict[int, float] = {}

    def add(d, v):
        if abs(v) > 0:
            out[d] = out.get(d, 0.0) + v

    # one-body
    for q in range(sorb):
        r1 = ann(det, q)
        if r1 is None:
            continue
        d1, ph1 = r1
        for p in range(sorb):
            if abs(h1e[p, q]) == 0:
                continue
            r2 = cre(d1, p)
            if r2 is None:
                continue
            d2, ph2 = r2
            add(d2, h1e[p, q] * ph1 * ph2)

    # two-body: 1/4 <pq||rs> a+p a+q a_s a_r
    occ = [i for i in range(sorb) if (det >> i) & 1]
    for r in occ:
        dr, phr = ann(det, r)
        occ_s = [i for i in range(sorb) if (dr >> i) & 1]
        for s in occ_s:
            ds, phs = ann(dr, s)
            for q in range(sorb):
                rq = cre(ds, q)
                if rq is None:
                    continue
                dq, phq = rq
                for p in range(sorb):
                    v = h2e_dense[p, q, r, s]
                    if abs(v) == 0:
                        continue
                    rp = cre(dq, p)
                    if rp is None:
                        continue
                    dp, php = rp
                    add(dp, 0.25 * v * phr * phs * phq * php)
    return out


def dense_h(
    dets: list[int], h1e: np.ndarray, h2e_dense: np.ndarray
) -> np.ndarray:
    """Dense Hamiltonian over a determinant list."""
    index = {d: i for i, d in enumerate(dets)}
    n = len(dets)
    H = np.zeros((n, n))
    for j, d in enumerate(dets):
        for d2, v in apply_h(d, h1e, h2e_dense).items():
            i = index.get(d2)
            if i is not None:
                H[i, j] += v
    return H


def det_to_bits(det: int, sorb: int) -> np.ndarray:
    return np.array([(det >> i) & 1 for i in range(sorb)], dtype=np.int8)


def bits_to_det(bits: np.ndarray) -> int:
    return int(sum(int(b) << i for i, b in enumerate(bits)))


def random_antisym_h2e(sorb: int, rng: np.random.Generator) -> np.ndarray:
    """Random real <pq||rs> with full antisymmetry + Hermitian symmetry."""
    a = rng.standard_normal((sorb,) * 4)
    a = a - a.transpose(1, 0, 2, 3)
    a = a - a.transpose(0, 1, 3, 2)
    a = a + a.transpose(2, 3, 0, 1)
    return a / 4.0
