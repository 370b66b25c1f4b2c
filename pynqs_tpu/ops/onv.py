"""Occupation-number-vector (ONV) primitives.

Layout conventions (compatible with the reference semantics in
/root/reference/cpp_src/cpu/onstate.cpp and libs/C_extension.pyi):

  * A determinant over ``sorb`` spin orbitals is a bitstring; bit ``s``
    set means spin orbital ``s`` is occupied.
  * Spin orbitals are interleaved: even index = alpha, odd = beta;
    spatial orbital of spin orbital ``s`` is ``s // 2``.
  * The device-primary representation is **unpacked**: ``bits`` arrays
    of dtype int8 with shape ``[..., sorb]`` holding 0/1.  This keeps
    every hot kernel a plain vector op on the TPU VPU.
  * The **packed** representation ``[..., n_words32]`` of dtype uint32
    (little-endian: bit s lives in word ``s // 32`` at position
    ``s % 32``) is used only as a compact key for sorting, dedup and
    wavefunction-LUT binary search.  It matches the reference's
    little-endian uint64 words (each u64 = our words ``2k`` (lo) and
    ``2k+1`` (hi)) so cross-checking against the reference is direct.
  * The "spins" float representation maps occupied -> +1.0,
    unoccupied -> -1.0 (reference ``onv_to_tensor``,
    C_extension.pyi:26-45).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "n_words32",
    "pack_bits",
    "unpack_bits",
    "bits_to_spins",
    "spins_to_bits",
    "prefix_occ",
    "parity",
    "merged_orbital_list",
    "permute_sgn_matrix",
    "permute_sgn",
    "popcount_u32",
    "compare_keys_lt",
    "compare_keys_le",
    "hf_bits",
    "spin_flip_bits",
    "spin_flip_sign",
]


def n_words32(sorb: int) -> int:
    """Number of uint32 words needed to pack ``sorb`` bits."""
    return (sorb + 31) // 32


def hf_bits(sorb: int, noa: int, nob: int) -> np.ndarray:
    """Hartree–Fock reference determinant as an unpacked bit vector.

    Lowest ``noa`` alpha (even) and ``nob`` beta (odd) spin orbitals
    occupied.
    """
    bits = np.zeros(sorb, dtype=np.int8)
    bits[0 : 2 * noa : 2] = 1
    bits[1 : 2 * nob : 2] = 1
    return bits


def pack_bits(bits: jax.Array) -> jax.Array:
    """Pack 0/1 bits [..., sorb] (any int/float dtype) into uint32 words.

    Implemented as two 16-bit dot products per word (no 1<<31 overflow
    in int32 arithmetic) — a cheap MXU/VPU friendly contraction rather
    than a scalar loop.
    """
    sorb = bits.shape[-1]
    nw = n_words32(sorb)
    pad = nw * 32 - sorb
    b = bits.astype(jnp.int32)
    if pad:
        b = jnp.pad(b, [(0, 0)] * (b.ndim - 1) + [(0, pad)])
    b = b.reshape(b.shape[:-1] + (nw, 2, 16))
    pow16 = jnp.asarray([1 << j for j in range(16)], dtype=jnp.int32)
    halves = jnp.einsum("...hj,j->...h", b, pow16).astype(jnp.uint32)
    lo = halves[..., 0]
    hi = halves[..., 1]
    return lo | (hi << jnp.uint32(16))


def unpack_bits(words: jax.Array, sorb: int) -> jax.Array:
    """Unpack uint32 words [..., nw] into 0/1 int8 bits [..., sorb]."""
    nw = words.shape[-1]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    b = (words[..., :, None] >> shifts) & jnp.uint32(1)
    b = b.reshape(words.shape[:-1] + (nw * 32,))
    return b[..., :sorb].astype(jnp.int8)


def bits_to_spins(bits: jax.Array, dtype=jnp.float32) -> jax.Array:
    """0/1 bits -> ±1 spins (occupied=+1, unoccupied=-1)."""
    return (2 * bits.astype(dtype)) - 1


def spins_to_bits(spins: jax.Array) -> jax.Array:
    """±1 spins -> 0/1 int8 bits."""
    return (spins > 0).astype(jnp.int8)


def prefix_occ(bits: jax.Array) -> jax.Array:
    """Exclusive prefix count of occupied orbitals.

    prefix_occ(bits)[..., s] = number of occupied spin orbitals with
    index strictly below s.  Shape preserved: [..., sorb].
    This single cumsum replaces all of the reference's per-orbital
    popcount parity loops (onstate.cpp:22-32).
    """
    c = jnp.cumsum(bits.astype(jnp.int32), axis=-1)
    return c - bits.astype(jnp.int32)


def parity(prefix: jax.Array, pos: jax.Array) -> jax.Array:
    """Fermionic sign (-1)^{#occupied below pos} as ±1 int32.

    ``prefix``: output of :func:`prefix_occ`, [..., sorb].
    ``pos``: integer orbital positions broadcastable against prefix
    batch dims; gathered along the last axis.
    """
    cnt = jnp.take_along_axis(prefix, pos[..., None], axis=-1)[..., 0]
    return 1 - 2 * (cnt & 1)


def merged_orbital_list(bits: jax.Array, noa: int, nob: int) -> jax.Array:
    """Interleaved occupied→virtual orbital list per sample.

    Reproduces the layout of ``get_olst_vlst_ab_cpu``
    (onstate.cpp:147-193): even slots hold alpha orbitals (the noa
    occupied ones in ascending order, then the nva virtual ones), odd
    slots hold beta orbitals likewise.  Shape [..., sorb] int32.

    Implemented with two stable key sorts (occupied-first) per spin
    channel instead of bit-scan loops.
    """
    sorb = bits.shape[-1]
    norb = sorb // 2
    spatial = jnp.arange(norb, dtype=jnp.int32)

    def channel(occ_ch, offset):
        # key: occupied orbitals sort before virtuals, each ascending.
        keys = (1 - occ_ch.astype(jnp.int32)) * norb + spatial
        vals = jnp.broadcast_to(2 * spatial + offset, occ_ch.shape)
        _, sorted_orbs = jax.lax.sort_key_val(keys, vals, dimension=-1)
        return sorted_orbs

    alpha = channel(bits[..., 0::2], 0)
    beta = channel(bits[..., 1::2], 1)
    merged = jnp.stack([alpha, beta], axis=-1)
    return merged.reshape(bits.shape[:-1] + (sorb,))


def permute_sgn_matrix(order) -> np.ndarray:
    """Static inversion-counting matrix for orbital-reordering signs.

    ``order``: spin-orbital visiting order (len sorb permutation).
    The fermionic sign of rewriting a determinant whose creation
    operators are applied in ``order`` into canonical ascending order
    is (-1)^(number of inversions among *occupied* orbitals):

        sgn = (-1)^{ occ_oᵀ A occ_o },  A[u,t] = (u < t) & (order[u] > order[t])

    with occ_o = bits gathered in ``order``.  Replaces the reference's
    sequential popcount loop (permute_sgn_cpu, onstate.cpp:195-223)
    with one MXU quadratic form per sample.
    """
    order = np.asarray(order)
    n = order.shape[0]
    u = np.arange(n)
    return ((u[:, None] < u[None, :]) & (order[:, None] > order[None, :])).astype(
        np.int32
    )


def permute_sgn(bits: jax.Array, A) -> jax.Array:
    """±1 reordering sign per sample. A from :func:`permute_sgn_matrix`
    built for the same order used to gather nothing — bits here are in
    CANONICAL orbital positions; gather with order first:
    ``permute_sgn(bits[..., order], A)``."""
    occ = bits.astype(jnp.int32)
    inv = jnp.einsum("...u,ut,...t->...", occ, jnp.asarray(A), occ)
    return 1 - 2 * (inv & 1)


def spin_flip_bits(bits: jax.Array) -> jax.Array:
    """α↔β spin flip: swap even/odd positions (reference
    spin_flip_onv / swap_odd_even_bits_8bit, public_function.py:966+)."""
    sorb = bits.shape[-1]
    perm = np.arange(sorb).reshape(-1, 2)[:, ::-1].reshape(-1)
    return bits[..., perm]


def spin_flip_sign(bits: jax.Array) -> jax.Array:
    """Fermionic sign of the spin-flip permutation applied to |n⟩.

    U_SF reorders creation operators by the pairwise even/odd swap;
    the sign is the reordering parity (same quadratic-form trick as
    :func:`permute_sgn`)."""
    sorb = bits.shape[-1]
    perm = np.arange(sorb).reshape(-1, 2)[:, ::-1].reshape(-1)
    A = permute_sgn_matrix(perm)
    return permute_sgn(bits[..., perm], jnp.asarray(A))


def popcount_u32(x: jax.Array) -> jax.Array:
    """Population count of uint32 words (SWAR bit-slicing)."""
    x = x.astype(jnp.uint32)
    x = x - ((x >> jnp.uint32(1)) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> jnp.uint32(2)) & jnp.uint32(0x33333333))
    x = (x + (x >> jnp.uint32(4))) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> jnp.uint32(24)).astype(jnp.int32)


def _cmp_words(a: jax.Array, b: jax.Array):
    """Lexicographic comparison helpers for multi-word keys.

    Keys are little-endian (word 0 least significant), matching the
    reference's BigInteger comparison (cuda/kernel.cu:608-620).
    Returns (lt, eq) boolean arrays over the broadcast batch shape.
    """
    nw = a.shape[-1]
    lt = jnp.zeros(jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1]), dtype=bool)
    eq = jnp.ones_like(lt)
    # scan from most significant word down
    for w in range(nw - 1, -1, -1):
        aw = a[..., w]
        bw = b[..., w]
        lt = lt | (eq & (aw < bw))
        eq = eq & (aw == bw)
    return lt, eq


def compare_keys_lt(a: jax.Array, b: jax.Array) -> jax.Array:
    """a < b lexicographically (little-endian multi-word uint32 keys)."""
    lt, _ = _cmp_words(a, b)
    return lt


def compare_keys_le(a: jax.Array, b: jax.Array) -> jax.Array:
    """a <= b lexicographically."""
    lt, eq = _cmp_words(a, b)
    return lt | eq
