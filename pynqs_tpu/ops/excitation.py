"""Singles-and-doubles excitation enumeration with static shapes.

For fixed (sorb, noa, nob) — all static under jit — the number of
connected determinants of any determinant with the right particle
numbers is a compile-time constant

    n_sd = nSa + nSb + nDaa + nDbb + nDab

(get_Num_SinglesDoubles, reference cpp_src/cpu/excitation.cpp:8-16).
The reference unpacks a flat excitation index into *positions* in the
per-sample interleaved occupied→virtual orbital list ("merged" list,
see :func:`pynqs_tpu.ops.onv.merged_orbital_list`) with a closed-form
5-case switch (excitation.cpp:18-105).  Because the positions depend
only on (sorb, noa, nob) — not on the sample — we precompute the whole
[n_sd, 4] position table **once on host** and the device kernel is a
single batched gather: orbitals = merged[:, pos].

Ordering: singles first (alpha then beta), then doubles (aaaa, bbbb,
abab), exactly matching the reference enumeration so excitation lists
can be cross-checked index by index.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "num_singles_doubles",
    "ExcitationTable",
    "excitation_table",
    "excited_orbitals",
    "make_comb_bits",
]


def num_singles_doubles(sorb: int, noa: int, nob: int) -> tuple[int, int, int]:
    """(n_singles, n_doubles, n_sd) for a (sorb, noa, nob) sector."""
    k = sorb // 2
    nva, nvb = k - noa, k - nob
    ns = noa * nva + nob * nvb
    ndaa = noa * (noa - 1) * nva * (nva - 1) // 4
    ndbb = nob * (nob - 1) * nvb * (nvb - 1) // 4
    ndab = noa * nob * nva * nvb
    nd = ndaa + ndbb + ndab
    return ns, nd, ns + nd


def _unpack_canon(ij: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Canonical pair index ij = i(i-1)/2 + j (i > j) -> (i, j)."""
    i = (np.sqrt((ij + 1) * 2.0) + 0.5).astype(np.int64)
    j = ij - i * (i - 1) // 2
    return i, j


@dataclass(frozen=True, eq=False)  # identity hash: safe as a jit static arg
class ExcitationTable:
    """Static per-sector excitation metadata.

    ``pos``: [n_sd, 4] int32 positions into the merged orbital list:
    (occ_i, virt_a, occ_j, virt_b).  For singles the (j, b) slots
    duplicate (i, a) and are ignored by the kernels (the reference
    instead double-flips merged[0], excitation.cpp:112-122 — same
    effect, ours avoids the wasted flips).

    Pair-factorized doubles metadata (for the MXU one-hot-matmul
    Slater–Condon path — TPU's scatter/gather unit is scalar-bound,
    so random h2e gathers are replaced by exact 0/1-matmul selection):
    ``upairs``/``vpairs``: distinct (slot, slot) occupied/virtual pair
    slots appearing in doubles; ``u_of_k``/``v_of_k``: [n_doubles]
    maps from each double to its pair rows.
    """

    sorb: int
    noa: int
    nob: int
    n_singles: int
    n_doubles: int
    pos: np.ndarray
    upairs: np.ndarray = None  # [n_u, 2] slot pairs (occupied)
    vpairs: np.ndarray = None  # [n_v, 2] slot pairs (virtual)
    u_of_k: np.ndarray = None  # [n_doubles]
    v_of_k: np.ndarray = None  # [n_doubles]

    @property
    def n_sd(self) -> int:
        return self.n_singles + self.n_doubles


@lru_cache(maxsize=32)
def excitation_table(sorb: int, noa: int, nob: int) -> ExcitationTable:
    """Precompute the [n_sd, 4] merged-list position table on host."""
    k = sorb // 2
    nva, nvb = k - noa, k - nob
    nsa, nsb = noa * nva, nob * nvb
    noaa = noa * (noa - 1) // 2
    nobb = nob * (nob - 1) // 2
    nvaa = nva * (nva - 1) // 2
    nvbb = nvb * (nvb - 1) // 2
    ndaa, ndbb, ndab = noaa * nvaa, nobb * nvbb, noa * nob * nva * nvb

    rows = []
    # alpha singles: occ slot 2*(k%noa), virt slot 2*(k//noa + noa)
    if nsa:
        kk = np.arange(nsa)
        i = 2 * (kk % noa)
        a = 2 * (kk // noa + noa)
        rows.append(np.stack([i, a, i, a], 1))
    # beta singles
    if nsb:
        kk = np.arange(nsb)
        i = 2 * (kk % nob) + 1
        a = 2 * (kk // nob + nob) + 1
        rows.append(np.stack([i, a, i, a], 1))
    # aaaa doubles
    if ndaa:
        kk = np.arange(ndaa)
        o0, o1 = _unpack_canon(kk % noaa)
        v0, v1 = _unpack_canon(kk // noaa)
        rows.append(
            np.stack([o0 * 2, (v0 + noa) * 2, o1 * 2, (v1 + noa) * 2], 1)
        )
    # bbbb doubles
    if ndbb:
        kk = np.arange(ndbb)
        o0, o1 = _unpack_canon(kk % nobb)
        v0, v1 = _unpack_canon(kk // nobb)
        rows.append(
            np.stack(
                [o0 * 2 + 1, (v0 + nob) * 2 + 1, o1 * 2 + 1, (v1 + nob) * 2 + 1], 1
            )
        )
    # abab doubles
    if ndab:
        kk = np.arange(ndab)
        ia = kk % (noa * nva)
        jb = kk // (noa * nva)
        i = (ia % noa) * 2
        a = (ia // noa + noa) * 2
        j = (jb % nob) * 2 + 1
        b = (jb // nob + nob) * 2 + 1
        rows.append(np.stack([i, a, j, b], 1))

    pos = (
        np.concatenate(rows, 0).astype(np.int32)
        if rows
        else np.zeros((0, 4), np.int32)
    )
    n_s = nsa + nsb
    n_d = ndaa + ndbb + ndab
    assert pos.shape[0] == n_s + n_d

    # pair-factorized doubles maps: distinct occupied (slot_i, slot_j)
    # and virtual (slot_a, slot_b) pairs, + per-double row indices
    dpos = pos[n_s:]
    occ_pairs = {}
    vir_pairs = {}
    u_of_k = np.zeros(n_d, np.int32)
    v_of_k = np.zeros(n_d, np.int32)
    for k in range(n_d):
        i, a, j, b = (int(x) for x in dpos[k])
        uo = (min(i, j), max(i, j))
        vv = (min(a, b), max(a, b))
        u_of_k[k] = occ_pairs.setdefault(uo, len(occ_pairs))
        v_of_k[k] = vir_pairs.setdefault(vv, len(vir_pairs))
    upairs = np.asarray(list(occ_pairs.keys()), np.int32).reshape(-1, 2)
    vpairs = np.asarray(list(vir_pairs.keys()), np.int32).reshape(-1, 2)
    return ExcitationTable(
        sorb=sorb, noa=noa, nob=nob, n_singles=n_s, n_doubles=n_d, pos=pos,
        upairs=upairs, vpairs=vpairs, u_of_k=u_of_k, v_of_k=v_of_k,
    )


def excited_orbitals(merged: jax.Array, pos: jax.Array) -> jax.Array:
    """Gather excitation orbital indices per sample.

    merged: [B, sorb] int32 (occupied→virtual interleaved list)
    pos:    [n_sd, 4] int32 static table
    returns [B, n_sd, 4] int32 orbital indices (i, a, j, b).
    """
    return merged[..., pos]  # fancy-gather along last axis


def make_comb_bits(
    bits: jax.Array, orbs: jax.Array, is_double: jax.Array
) -> jax.Array:
    """Excited determinants as unpacked bits.

    bits: [B, sorb] 0/1; orbs: [B, n, 4] (i, a, j, b) orbital indices;
    is_double: [n] bool.  Returns [B, n, sorb] int8 with bits i (and j)
    cleared and a (and b) set.
    """
    sorb = bits.shape[-1]
    oh = jax.nn.one_hot(orbs, sorb, dtype=jnp.int8)  # [B, n, 4, sorb]
    flip_s = oh[..., 0, :] + oh[..., 1, :]
    flip_d = flip_s + oh[..., 2, :] + oh[..., 3, :]
    flips = jnp.where(is_double[None, :, None], flip_d, flip_s)
    return jnp.bitwise_xor(bits[:, None, :].astype(jnp.int8), flips % 2)
