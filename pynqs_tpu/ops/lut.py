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
    "lut_search_mxu",
    "lut_lookup_mxu",
    "lut_lookup_merge",
    "WavefunctionLUT",
]

# The one-hot key/value matmuls must be exact: the 16-bit key halves
# (values up to 65535) are NOT representable in bf16, so the TPU
# default single-pass-bf16 matmul precision would silently turn real
# hits into misses.  Pin full precision.
_HI = jax.lax.Precision.HIGHEST


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


def lut_search_mxu(
    sorted_keys: jax.Array, queries: jax.Array, bucket: int = 128
):
    """Bucketed one-hot-matmul lookup — the TPU-fast LUT path.

    `lut_search`'s bisection issues log2(M) data-dependent row gathers
    per query, which lower to the TPU scalar core (seconds for 16M
    queries).  Here instead:

      1. bucket id = #splitters ≤ q  (vectorized lexicographic
         compares against the M/bucket splitter keys),
      2. the query's candidate bucket rows arrive via an exact one-hot
         MXU matmul (no gather),
      3. equality against the bucket gives found + local position.

    Returns (idx [Q] int32, found [Q] bool).  Cost ≈ Q·nb lex compares
    + Q×nb×bucket·nw MXU flops — ~ms-scale for 16M × 4096.
    """
    m, nw = sorted_keys.shape
    nb = -(-m // bucket)  # ceil
    pad = nb * bucket - m
    keys = sorted_keys
    if pad:
        # pad with the max key (sorts after everything real)
        keys = jnp.concatenate(
            [keys, jnp.broadcast_to(keys[-1:], (pad, nw))], axis=0
        )
    table = keys.reshape(nb, bucket, nw)
    splitters = table[:, 0, :]  # [nb, nw]

    q = queries  # [Q, nw]
    # bucket id: (# splitters <= q) - 1, clipped at 0
    le = onv.compare_keys_le(splitters[None, :, :], q[:, None, :])  # [Q, nb]
    bid = jnp.maximum(le.sum(-1).astype(jnp.int32) - 1, 0)
    oh = jax.nn.one_hot(bid, nb, dtype=jnp.float32)  # [Q, nb]
    # candidate rows via exact one-hot matmul (keys as f32 halves to
    # stay exact: uint32 split into two 16-bit parts < 2^24)
    t_lo = (table & jnp.uint32(0xFFFF)).astype(jnp.float32)
    t_hi = (table >> jnp.uint32(16)).astype(jnp.float32)
    flat = jnp.concatenate(
        [t_lo.reshape(nb, -1), t_hi.reshape(nb, -1)], axis=-1
    )  # [nb, 2*bucket*nw]
    cand = jnp.einsum("qb,bf->qf", oh, flat, precision=_HI)
    c_lo = cand[:, : bucket * nw].reshape(-1, bucket, nw)
    c_hi = cand[:, bucket * nw :].reshape(-1, bucket, nw)
    q_lo = (q & jnp.uint32(0xFFFF)).astype(jnp.float32)
    q_hi = (q >> jnp.uint32(16)).astype(jnp.float32)
    eq = ((c_lo == q_lo[:, None, :]) & (c_hi == q_hi[:, None, :])).all(-1)
    found = eq.any(-1)
    local = jnp.argmax(eq, axis=-1).astype(jnp.int32)
    idx = jnp.clip(bid * bucket + local, 0, m - 1)
    return idx, found


def lut_lookup_mxu(
    sorted_keys: jax.Array,
    values: jax.Array,
    queries: jax.Array,
    fill=0.0,
    bucket: int = 128,
):
    """One-hot-matmul key+value lookup (see lut_search_mxu): values are
    pulled through the same exact one-hot contraction, so the whole
    lookup is gather-free.  values [M, V]; returns ([Q, V], found)."""
    m, nw = sorted_keys.shape
    vdim = values.shape[-1]
    nb = -(-m // bucket)
    pad = nb * bucket - m
    keys = sorted_keys
    vals = values
    if pad:
        keys = jnp.concatenate(
            [keys, jnp.broadcast_to(keys[-1:], (pad, nw))], axis=0
        )
        vals = jnp.concatenate(
            [vals, jnp.zeros((pad, vdim), values.dtype)], axis=0
        )
    table = keys.reshape(nb, bucket, nw)
    vtab = vals.reshape(nb, bucket * vdim)
    splitters = table[:, 0, :]

    q = queries
    le = onv.compare_keys_le(splitters[None, :, :], q[:, None, :])
    bid = jnp.maximum(le.sum(-1).astype(jnp.int32) - 1, 0)
    oh = jax.nn.one_hot(bid, nb, dtype=jnp.float32)
    t_lo = (table & jnp.uint32(0xFFFF)).astype(jnp.float32)
    t_hi = (table >> jnp.uint32(16)).astype(jnp.float32)
    flat = jnp.concatenate(
        [t_lo.reshape(nb, -1), t_hi.reshape(nb, -1)], axis=-1
    )
    cand = jnp.einsum("qb,bf->qf", oh, flat, precision=_HI)
    c_lo = cand[:, : bucket * nw].reshape(-1, bucket, nw)
    c_hi = cand[:, bucket * nw :].reshape(-1, bucket, nw)
    q_lo = (q & jnp.uint32(0xFFFF)).astype(jnp.float32)
    q_hi = (q >> jnp.uint32(16)).astype(jnp.float32)
    eq = ((c_lo == q_lo[:, None, :]) & (c_hi == q_hi[:, None, :])).all(-1)
    found = eq.any(-1)
    # value selection in the values' own dtype (f64 on CPU stays exact)
    cand_vals = jnp.einsum(
        "qb,bf->qf", oh.astype(vtab.dtype), vtab, precision=_HI
    ).reshape(-1, bucket, vdim)
    sel = (eq.astype(vtab.dtype)[:, :, None] * cand_vals).sum(1)
    out = jnp.where(found[:, None], sel, fill)
    return out, found


def lut_lookup_merge(
    sorted_keys: jax.Array,
    values: jax.Array,
    queries: jax.Array,
    fill=0.0,
):
    """Sorted merge-join lookup — the TPU path for LARGE tables.

    The bucketed one-hot fetch (lut_lookup_mxu) costs Q×M MXU flops —
    linear in the table size — so past ~64k keys it loses to anything;
    bisection is log2(M) scalar-bound gathers per query (seconds at
    Fe2S2 scale, cpp_src/cuda/hashTable.cu's job on GPU).  Merge-join
    is gather-free AND M-independent per query:

      1. sort [table keys | query keys] together (table rows win ties),
      2. a segmented carry-forward associative scan gives every query
         row the nearest table row at or below it,
      3. equality check -> found; one more sort restores query order.

    Cost: two sorts of (M+Q) rows + a log-depth scan.  values [M, V];
    returns ([Q, V], found [Q]).
    """
    m, nw = sorted_keys.shape
    qn = queries.shape[0]
    vals2d = values[:, None] if values.ndim == 1 else values
    vdim = vals2d.shape[-1]
    n = m + qn

    keys_all = jnp.concatenate([sorted_keys, queries], axis=0)
    is_query = jnp.concatenate(
        [jnp.zeros((m,), jnp.int32), jnp.ones((qn,), jnp.int32)]
    )
    qidx = jnp.concatenate(
        [jnp.zeros((m,), jnp.int32), jnp.arange(qn, dtype=jnp.int32)]
    )
    vpad = jnp.concatenate(
        [vals2d, jnp.zeros((qn, vdim), vals2d.dtype)], axis=0
    )

    # sort by key (lexicographic), table rows before equal queries
    sort_keys = [
        _flip_sign_bit(keys_all[:, w]) for w in range(nw - 1, -1, -1)
    ] + [is_query]
    ops = (
        *sort_keys,
        *[keys_all[:, w] for w in range(nw)],
        is_query,
        qidx,
        *[vpad[:, c] for c in range(vdim)],
    )
    out = jax.lax.sort(ops, dimension=0, is_stable=True, num_keys=nw + 1)
    base = nw + 1
    skeys = jnp.stack(out[base : base + nw], axis=-1)
    s_isq = out[base + nw]
    s_qidx = out[base + nw + 1]
    s_vals = jnp.stack(out[base + nw + 2 :], axis=-1)

    # segmented carry-forward: every row learns the last TABLE row <= it
    is_table = (s_isq == 0)[:, None]
    carry_val = jnp.where(is_table, s_vals, 0.0)
    carry_key = jnp.where(is_table, skeys, 0)
    flag = is_table.astype(jnp.int32)[:, 0]

    def combine(a, b):
        av, ak, af = a
        bv, bk, bf = b
        take_b = (bf > 0)[..., None]
        return (
            jnp.where(take_b, bv, av),
            jnp.where(take_b, bk, ak),
            jnp.maximum(af, bf),
        )

    cv, ck, _ = jax.lax.associative_scan(
        combine, (carry_val, carry_key, flag), axis=0
    )
    found_s = (ck == skeys).all(-1) & (s_isq == 1)
    out_s = jnp.where(found_s[:, None], cv, fill)

    # restore query order: queries first (is_table=1 sorts after), by qidx
    ops2 = (
        (s_isq == 0).astype(jnp.int32),
        s_qidx,
        found_s.astype(jnp.int32),
        *[out_s[:, c] for c in range(vdim)],
    )
    out2 = jax.lax.sort(ops2, dimension=0, is_stable=True, num_keys=2)
    found = out2[2][:qn] > 0
    res = jnp.stack(out2[3:], axis=-1)[:qn]
    if values.ndim == 1:
        res = res[:, 0]
    return res, found


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

    def lookup_packed(self, packed: jax.Array, fill=0.0, method: str = "auto"):
        """method: "mxu" (gather-free one-hot matmul — TPU default for
        tables ≤ 64k keys), "merge" (sorted merge-join — table-size-
        independent, the TPU path past 64k keys), "bisect" (log2(M)
        scalar probes — CPU), or "auto"."""
        m = self.sorted_keys.shape[0]
        if method == "auto":
            if jax.default_backend() == "cpu":
                # the one-hot MXU matmul is a TPU trick; on CPU it is
                # an O(Q·M) dense product — log2(M) bisection wins
                method = "bisect"
            else:
                method = "mxu" if m <= (1 << 16) else "merge"
        if method == "merge":
            vals2d = (
                self.values[:, None] if self.values.ndim == 1 else self.values
            )
            out, found = lut_lookup_merge(
                self.sorted_keys, vals2d, packed, fill
            )
            if self.values.ndim == 1:
                out = out[:, 0]
            return out, found
        if method == "mxu":
            vals2d = (
                self.values[:, None] if self.values.ndim == 1 else self.values
            )
            out, found = lut_lookup_mxu(
                self.sorted_keys, vals2d, packed, fill
            )
            if self.values.ndim == 1:
                out = out[:, 0]
            return out, found
        idx, found = lut_search(self.sorted_keys, packed)
        vals = jnp.take(self.values, idx, axis=0)
        mask = found if vals.ndim == found.ndim else found[..., None]
        return jnp.where(mask, vals, fill), found

    def lookup(self, bits: jax.Array, fill=0.0):
        return self.lookup_packed(onv.pack_bits(bits), fill)
