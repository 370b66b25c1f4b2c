"""Sorted-ONV lookup tables, dedup and sample merging.

TPU re-design of three reference native components:

  * `wavefunction_lut` — binary search of ≤192-bit packed ONV keys
    (cpp_src/cuda/kernel.cu:653 `binary_search_BigInteger`,
    tensor/cuda_tensor.cpp:436) -> branchless `lax.fori_loop` bisection
    over lexicographic multi-word uint32 keys, vectorized over queries.
  * CUDA open-addressing hash table (cpp_src/cuda/hashTable.cu) — on
    TPU, sorted binary search wins (no scatter/atomics, log2(n) fully
    vectorized probes); the hash table is intentionally NOT replicated.
  * `merge_rank_sample` atomic scatter-add merging (kernel.cu:520) ->
    sort + segment-boundary flags + `jax.ops.segment_sum`, all static
    shape.

Keys sort little-endian-lexicographically (word 0 least significant),
matching the reference's BigInteger order, so spaces produced by
`utils.fci.fci_bits` (ascending integers) are already sorted.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from pynqs_tpu.ops import onv

__all__ = [
    "sort_onv",
    "unique_onv",
    "lut_search",
    "WavefunctionLUT",
]


def _flip_sign_bit(w: jax.Array) -> jax.Array:
    """uint32 -> order-preserving int32 (lax.sort has no uint compare on all paths)."""
    return (w ^ jnp.uint32(0x80000000)).astype(jnp.int32)


def sort_onv(packed: jax.Array, *payloads: jax.Array):
    """Sort packed ONVs [N, nw] lexicographically; payloads follow.

    Returns (sorted_packed, *sorted_payloads).
    """
    nw = packed.shape[-1]
    keys = [_flip_sign_bit(packed[:, w]) for w in range(nw - 1, -1, -1)]
    ops = (*keys, *[packed[:, w] for w in range(nw)], *payloads)
    out = jax.lax.sort(ops, dimension=0, is_stable=True, num_keys=nw)
    sorted_packed = jnp.stack(out[nw : 2 * nw], axis=-1)
    return (sorted_packed, *out[2 * nw :])


def _row_equal(a: jax.Array, b: jax.Array) -> jax.Array:
    return (a == b).all(axis=-1)


def unique_onv(packed: jax.Array, counts: jax.Array):
    """Merge duplicate ONVs: sorted unique keys + summed counts.

    packed [N, nw] uint32, counts [N] (0 = dead row; dead rows sort
    wherever their key lands but contribute 0 count and are squeezed
    out by the validity mask).  Returns (unique_packed [N, nw],
    unique_counts [N], n_unique scalar): rows [0, n_unique) are the
    unique live keys, the tail is zero-padded.
    """
    n = packed.shape[0]
    # sort dead rows (count 0) to the end by prepending a liveness key
    dead = (counts == 0).astype(jnp.int32)
    nw = packed.shape[-1]
    keys = [dead] + [
        _flip_sign_bit(packed[:, w]) for w in range(nw - 1, -1, -1)
    ]
    ops = (*keys, *[packed[:, w] for w in range(nw)], counts)
    out = jax.lax.sort(ops, dimension=0, is_stable=True, num_keys=nw + 1)
    sp = jnp.stack(out[nw + 1 : 2 * nw + 1], axis=-1)
    sc = out[-1]
    live = sc > 0
    is_new = jnp.concatenate(
        [jnp.ones((1,), bool), ~_row_equal(sp[1:], sp[:-1])]
    ) & live
    seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # [-0 .. n_unique-1]
    n_unique = is_new.sum()
    merged = jax.ops.segment_sum(sc, jnp.where(live, seg, n - 1), n)
    # representative rows: first row of each segment
    first_idx = jnp.where(is_new, jnp.arange(n), n - 1)
    rep = jax.ops.segment_max(
        jnp.where(is_new, jnp.arange(n), 0), jnp.where(is_new, seg, n - 1), n
    )
    uniq = jnp.take(sp, rep, axis=0)
    valid = jnp.arange(n) < n_unique
    merged = jnp.where(valid, merged, 0)
    uniq = jnp.where(valid[:, None], uniq, 0)
    return uniq, merged, n_unique


def lut_search(sorted_keys: jax.Array, queries: jax.Array):
    """Vectorized bisection. sorted_keys [M, nw], queries [Q, nw].

    Returns (idx [Q] int32, found [Q] bool): position of each query in
    the table (idx valid only where found).
    """
    m = sorted_keys.shape[0]
    n_iter = max(1, (m - 1).bit_length())

    lo = jnp.zeros(queries.shape[0], jnp.int32)
    hi = jnp.full(queries.shape[0], m, jnp.int32)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        mid_keys = jnp.take(sorted_keys, mid, axis=0)
        is_lt = onv.compare_keys_lt(mid_keys, queries)  # table[mid] < q
        lo = jnp.where(is_lt, mid + 1, lo)
        hi = jnp.where(is_lt, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, n_iter + 1, body, (lo, hi))
    idx = jnp.clip(lo, 0, m - 1)
    found = _row_equal(jnp.take(sorted_keys, idx, axis=0), queries)
    return idx, found


@dataclass(frozen=True)
class WavefunctionLUT:
    """ψ cache over a sorted determinant set (reference
    utils/public_function.py:749-868).  ``values`` is per-key data —
    typically the (log|ψ|, arg ψ) pair [M, 2]; misses return ``fill``."""

    sorted_keys: jax.Array  # [M, nw] uint32
    values: jax.Array  # [M, ...] (pair or any payload)

    @classmethod
    def build(cls, bits: jax.Array, values: jax.Array) -> "WavefunctionLUT":
        packed = onv.pack_bits(bits)
        if values.ndim == 1:
            sp, sv = sort_onv(packed, values)
        else:
            cols = [values[..., c] for c in range(values.shape[-1])]
            sp, *scols = sort_onv(packed, *cols)
            sv = jnp.stack(scols, axis=-1)
        return cls(sorted_keys=sp, values=sv)

    def lookup_packed(self, packed: jax.Array, fill=0.0):
        idx, found = lut_search(self.sorted_keys, packed)
        vals = jnp.take(self.values, idx, axis=0)
        mask = found if vals.ndim == found.ndim else found[..., None]
        return jnp.where(mask, vals, fill), found

    def lookup(self, bits: jax.Array, fill=0.0):
        return self.lookup_packed(onv.pack_bits(bits), fill)
