"""Slater–Condon matrix elements, TPU-first.

Physics identical to the reference (cpp_src/cpu/hamiltonian.cpp,
cpp_src/cpu/excitation.cpp:124-169), but the algorithm is restructured
for the MXU/VPU instead of per-thread scalar loops:

  * Diagonal  <n|H|n> = occ·diag(h1e) + ½ occᵀ K occ   (quadratic form,
    K[p,q] = <pq||pq>) — two matmuls for a whole batch.
  * Singles   <n|H|n_i^a> = (h1e[i,a] + Σ_{k∈occ} <ik||ak>) · sign.
    The k-sum for *all* (i,a) at once is one matmul occ @ J with
    J[k, (i,a)] = <ik||ak>, followed by a per-sample gather of the
    n_singles needed entries.
  * Doubles   <n|H|n_ij^ab> = <pq||rs> · sign — one flat gather from
    the compressed triangle per excitation.
  * Fermionic signs come from a single exclusive-prefix-popcount
    (cumsum) per sample plus O(1) corrections for the flipped bits —
    no per-orbital parity loops (vs. onstate.cpp:22-32 called 4× per
    element in the reference).

All shapes are static given (sorb, noa, nob): this module jit-compiles
once per sector.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from pynqs_tpu.ops import onv
from pynqs_tpu.ops.excitation import ExcitationTable, make_comb_bits

__all__ = [
    "hij_diagonal",
    "comb_hij",
    "hij_pairs",
    "hij_dense",
]

# Physics matmuls must not run at the TPU default (single-pass bf16)
# matmul precision: the integral values truncate to 8-bit mantissas,
# ~1e-3 relative error on every matrix element.  Pin full precision on
# every matmul whose non-one-hot operand carries integral data.
_HI = jax.lax.Precision.HIGHEST


def _split3(x):
    """Three-term bf16 split of an f32/f64 array: hi + lo + lo2 carries
    >= 24 mantissa bits, so a one-hot (exact bf16) x split3 contraction
    accumulated in f32 is f32-faithful at single-pass cost per term."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    lo = r1.astype(jnp.bfloat16)
    lo2 = (r1 - lo.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo, lo2


def _pair_sector(slot_pairs: np.ndarray) -> np.ndarray:
    """Static spin sector of merged-list slot pairs: 0 = alpha-alpha,
    1 = beta-beta, 2 = alpha-beta (even slots hold alpha orbitals —
    onv.merged_orbital_list's interleaved layout)."""
    par = slot_pairs % 2
    return np.where(
        (par[:, 0] == 0) & (par[:, 1] == 0),
        0,
        np.where((par[:, 0] == 1) & (par[:, 1] == 1), 1, 2),
    )


def _doubles_pair_values(merged, hpair_sect, table, dtype):
    """Unsigned <ij||ab> per double via per-SPIN-SECTOR one-hot MXU
    selection (round 4).

    A pair's total Sz labels its (aa, bb, ab) sector, and every SD
    double couples a same-sector occupied pair to a same-sector
    virtual pair — so the doubles selection never reads a
    cross-sector entry of the pair matrix (for Sz-conserving
    integrals those entries are zero anyway).  Contracting each
    sector against its own block (sector-local pair indexing,
    ops/integrals.sector_pair_index) instead of the full npair-wide
    matrix cuts the dominant one-hot operand's FLOPs ~5.8x and HBM
    traffic ~2.6x at Fe2S2 geometry — exact for arbitrary h2e, not an
    approximation.

    merged: [B, sorb] interleaved orbital list; hpair_sect: (H_aa,
    H_bb, H_ab) sector blocks.  Returns [B, n_doubles] f(dtype) values
    in the table's double order (signs applied by the caller).
    """
    B = merged.shape[0]
    norb = table.sorb // 2
    up = np.asarray(table.upairs)
    vp = np.asarray(table.vpairs)
    su = _pair_sector(up)
    sv = _pair_sector(vp)
    # construction order aaaa -> bbbb -> abab makes sectors contiguous
    assert (np.diff(su) >= 0).all() and (np.diff(sv) >= 0).all()
    npair_s = (norb * (norb - 1) // 2, norb * (norb - 1) // 2, norb * norb)

    def local_pair_idx(slots, sector):
        o1 = jnp.take(merged, jnp.asarray(slots[:, 0]), axis=-1)
        o2 = jnp.take(merged, jnp.asarray(slots[:, 1]), axis=-1)
        if sector < 2:  # same-spin: spatial triangle index
            s1, s2 = o1 >> 1, o2 >> 1
            hi = jnp.maximum(s1, s2)
            lo = jnp.minimum(s1, s2)
            return hi * (hi - 1) // 2 + lo
        # ab: the alpha member is the even SLOT (static parity)
        a_first = jnp.asarray(slots[:, 0] % 2 == 0)
        oa = jnp.where(a_first, o1, o2)
        ob = jnp.where(a_first, o2, o1)
        return (oa >> 1) * norb + (ob >> 1)

    parts = []
    off = np.zeros(3, np.int64)  # flat offset of each sector's W block
    u_start = np.zeros(3, np.int64)
    v_start = np.zeros(3, np.int64)
    n_vs_arr = np.zeros(3, np.int64)
    cur = 0
    for s in range(3):
        us = np.flatnonzero(su == s)
        vs = np.flatnonzero(sv == s)
        n_us, n_vs = len(us), len(vs)
        off[s] = cur
        u_start[s] = us[0] if n_us else 0
        v_start[s] = vs[0] if n_vs else 0
        n_vs_arr[s] = n_vs
        if n_us == 0 or n_vs == 0:
            continue
        po_s = local_pair_idx(up[us], s)  # [B, n_us]
        pv_s = local_pair_idx(vp[vs], s)  # [B, n_vs]
        Hs = hpair_sect[s]
        nps = npair_s[s]
        if dtype == jnp.float32:
            # exact bf16 one-hots x 3-way bf16-split integral side,
            # f32 accumulate; T's splits stacked so the larger Po
            # one-hot streams through the MXU once (same scheme as the
            # dense path below, per sector)
            Pv = jax.nn.one_hot(pv_s, nps, dtype=jnp.bfloat16)
            Po = jax.nn.one_hot(po_s, nps, dtype=jnp.bfloat16)
            T = sum(
                jnp.einsum(
                    "bvp,pq->bvq", Pv, h_k,
                    preferred_element_type=jnp.float32,
                )
                for h_k in _split3(Hs)
            )  # [B, n_vs, nps] f32
            T3 = jnp.concatenate(list(_split3(T)), axis=1)
            W3 = jnp.einsum(
                "bup,bvp->buv", Po, T3,
                preferred_element_type=jnp.float32,
            )  # [B, n_us, 3*n_vs]
            W = W3.reshape(B, n_us, 3, n_vs).sum(2)
        else:
            Pv = jax.nn.one_hot(pv_s, nps, dtype=dtype)
            T = jnp.einsum("bvp,pq->bvq", Pv, Hs, precision=_HI)
            Po = jax.nn.one_hot(po_s, nps, dtype=dtype)
            W = jnp.einsum("bup,bvp->buv", Po, T, precision=_HI)
        parts.append(W.reshape(B, n_us * n_vs))
        cur += n_us * n_vs
    Wcat = jnp.concatenate(parts, axis=-1)
    # static per-double flat index into the sector-blocked layout
    u_of_k = table.u_of_k.astype(np.int64)
    v_of_k = table.v_of_k.astype(np.int64)
    sk = su[u_of_k]
    assert (sk == sv[v_of_k]).all()  # doubles conserve spin
    uv = (
        off[sk]
        + (u_of_k - u_start[sk]) * n_vs_arr[sk]
        + (v_of_k - v_start[sk])
    )
    return jnp.take(Wcat, jnp.asarray(uv), axis=-1)  # static idx [B, nd]


def hij_diagonal(bits: jax.Array, diag1: jax.Array, K: jax.Array) -> jax.Array:
    """<n|H|n> for a batch. bits [B, sorb] -> [B]."""
    occ = bits.astype(K.dtype)
    e1 = jnp.einsum("...p,p->...", occ, diag1, precision=_HI)
    e2 = 0.5 * jnp.einsum("...p,pq,...q->...", occ, K, occ, precision=_HI)
    return e1 + e2


def _tri_index(p0, p1, q0, q1):
    """Compressed-triangle flat index for canonical (p0>p1, q0>q1)."""
    ij = p0 * (p0 - 1) // 2 + p1
    kl = q0 * (q0 - 1) // 2 + q1
    hi = jnp.maximum(ij, kl)
    lo = jnp.minimum(ij, kl)
    return hi * (hi + 1) // 2 + lo


def _parity_from_count(cnt: jax.Array) -> jax.Array:
    return (1 - 2 * (cnt & 1)).astype(jnp.int32)


@partial(jax.jit, static_argnames=("table", "with_comb", "pair_select"))
def comb_hij(
    bits: jax.Array,
    h1e: jax.Array,
    h2e: jax.Array,
    diag1: jax.Array,
    K: jax.Array,
    J: jax.Array,
    hpair: jax.Array | None = None,
    *,
    table: ExcitationTable,
    with_comb: bool = True,
    pair_select: str = "auto",
):
    """Fused connected-determinant enumeration + matrix elements.

    The TPU equivalent of the reference's hot `get_comb_hij_fused`
    (cuda/excitation.cu:130, exposed via bind.cpp).

    bits: [B, sorb] 0/1 int8 samples.
    Returns (comb_bits, hij):
      comb_bits: [B, 1 + n_sd, sorb] int8 — row 0 is the sample itself
                 (matching get_comb_tensor's layout, C_extension.pyi:47+)
                 or None when with_comb=False.
      hij:       [B, 1 + n_sd] — hij[:, 0] = <n|H|n>.
    """
    sorb = table.sorb
    ns, nd = table.n_singles, table.n_doubles
    pos = jnp.asarray(table.pos)  # [n_sd, 4]
    dtype = K.dtype

    occ = bits.astype(dtype)  # [B, sorb]
    prefix = onv.prefix_occ(bits)  # [B, sorb] int32
    merged = onv.merged_orbital_list(bits, table.noa, table.nob)  # [B, sorb]
    orbs = jnp.take(merged, pos, axis=-1)  # [B, n_sd, 4]
    # prefix counts re-indexed in merged-list order: ALL sign-count
    # lookups then use STATIC slot indices (pos), avoiding the
    # per-element dynamic take_along_axis gathers that dominate on TPU
    # (43 ms each at [512, 7725] vs ~3 ms for a static-index take).
    if dtype == jnp.float32:
        # gather-free: merged is a per-row permutation, prefix counts
        # are < sorb ≤ 127 — both exact in bf16, so one single-pass
        # one-hot matmul replaces the [B, sorb] scalar-core gather
        ohm = jax.nn.one_hot(merged, sorb, dtype=jnp.bfloat16)
        pm = jnp.einsum(
            "bsq,bq->bs", ohm, prefix.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
    else:
        pm = jnp.take_along_axis(prefix, merged, axis=-1)  # [B, sorb]
    cnts = jnp.take(pm, pos, axis=-1)  # [B, n_sd, 4] prefix @ (i, a, j, b)

    # ---- diagonal ----
    hii = hij_diagonal(bits, diag1, K)  # [B]

    # ---- singles: one MXU matmul + gather ----
    # S_full[b, p*sorb+q] = h1e[p,q] + sum_k occ_k <pk||qk>
    s_full = (
        jnp.einsum("bp,pq->bq", occ, J, precision=_HI)
        + h1e.reshape(-1)[None, :]
    )  # [B, sorb*sorb]
    orb_s = orbs[:, :ns, :]  # [B, ns, 4]
    i_s = orb_s[..., 0]
    a_s = orb_s[..., 1]
    if dtype == jnp.float32 and ns > 0:
        # gather-free singles pickup: select S[b, i, a] through a
        # one-hot contraction over i (bf16-exact one-hot × 3-way
        # bf16-split integral side, f32 accumulate — f32-faithful)
        # and an exact masked reduce over a.  Replaces the [B, ns]
        # scalar-core gather.
        s3 = s_full.reshape(-1, sorb, sorb)
        oh_i = jax.nn.one_hot(i_s, sorb, dtype=jnp.bfloat16)

        def _sp3(x):
            hi = x.astype(jnp.bfloat16)
            r1 = x - hi.astype(jnp.float32)
            lo = r1.astype(jnp.bfloat16)
            lo2 = (r1 - lo.astype(jnp.float32)).astype(jnp.bfloat16)
            return hi, lo, lo2

        x_sq = sum(
            jnp.einsum(
                "bsp,bpq->bsq", oh_i, s_k,
                preferred_element_type=jnp.float32,
            )
            for s_k in _sp3(s3)
        )  # [B, ns, sorb]
        mask_a = a_s[..., None] == jnp.arange(sorb, dtype=a_s.dtype)
        val_s = jnp.where(mask_a, x_sq, 0.0).sum(-1)
    else:
        val_s = jnp.take_along_axis(
            s_full, i_s * sorb + a_s, axis=-1
        )  # [B, ns]
    cnt_ia = cnts[:, :ns, 0] + cnts[:, :ns, 1] - (i_s < a_s)
    sgn_s = _parity_from_count(cnt_ia).astype(dtype)
    hij_s = val_s * sgn_s

    # ---- doubles: flat gather + prefix-corrected signs ----
    orb_d = orbs[:, ns:, :]  # [B, nd, 4]
    i_d, a_d, j_d, b_d = (orb_d[..., k] for k in range(4))
    p0 = jnp.maximum(i_d, j_d)
    p1 = jnp.minimum(i_d, j_d)
    q0 = jnp.maximum(a_d, b_d)
    q1 = jnp.minimum(a_d, b_d)
    if (
        isinstance(hpair, (tuple, list))
        and table.upairs is not None
        and nd > 0
    ):
        # preferred round-4 path: per-spin-sector one-hot selection
        # over the (H_aa, H_bb, H_ab) blocks — exact, ~5.8x fewer
        # FLOPs than the dense pair matrix (see _doubles_pair_values)
        if pair_select in ("pallas", "pallas_interpret"):
            raise ValueError(
                "pair_select='pallas' needs the dense hpair matrix, "
                "not sector blocks"
            )
        val_d = _doubles_pair_values(merged, hpair, table, dtype)
    elif hpair is not None and table.upairs is not None and nd > 0:
        # MXU path: XLA's TPU gather runs on the scalar core (~9 ns per
        # element — 140 ms for [2048, 7725] on Fe2S2).  Instead select
        # the needed <ij||ab> values through exact one-hot matmuls over
        # the dense pair matrix: W[b,u,v] = onehot(po)·Hpair·onehot(pv)ᵀ,
        # then one STATIC-index take per double.  ~174 GFLOP at
        # B=2048 on Fe2S2 — a few ms of MXU time.
        B = bits.shape[0]
        npair = hpair.shape[0]
        up = jnp.asarray(table.upairs)
        vp = jnp.asarray(table.vpairs)
        o1 = jnp.take(merged, up[:, 0], axis=-1)
        o2 = jnp.take(merged, up[:, 1], axis=-1)
        hi_o = jnp.maximum(o1, o2)
        lo_o = jnp.minimum(o1, o2)
        po = hi_o * (hi_o - 1) // 2 + lo_o  # [B, n_u]
        v1 = jnp.take(merged, vp[:, 0], axis=-1)
        v2 = jnp.take(merged, vp[:, 1], axis=-1)
        hi_v = jnp.maximum(v1, v2)
        lo_v = jnp.minimum(v1, v2)
        pv = hi_v * (hi_v - 1) // 2 + lo_v  # [B, n_v]
        # one-hot × integral-value selections.  The one-hot operand is
        # EXACT in bf16 (0/1), so instead of Precision.HIGH (3-pass
        # bf16 splitting of BOTH operands) split only the integral
        # side into three bf16 terms (hi + lo + lo2 carries ≥24
        # mantissa bits — f32-faithful like HIGH) and keep the one-hot
        # side single-pass bf16: same pass count, HALF the HBM traffic
        # of the dominant [B, n_u, npair] operand (~2.8 GB f32 at
        # Fe2S2 B=2048).  Single-pass DEFAULT on the integral side
        # truncates to 8-bit mantissas and corrupted round-1 energies.
        # NOT in "auto": the VMEM kernel produces wrong values on the
        # real Mosaic backend (interpret mode is exact) — under
        # investigation; the stacked-split one-hot einsum below is the
        # validated production path.  Opt in with pair_select="pallas".
        use_pallas = pair_select in ("pallas", "pallas_interpret")
        if use_pallas:
            # VMEM-resident selection (ops/pallas_hij.py): the one-hot
            # never touches HBM and the T rows are exact f32
            from pynqs_tpu.ops.pallas_hij import pair_select_w

            W = pair_select_w(
                po, pv, hpair.astype(jnp.float32),
                interpret=pair_select == "pallas_interpret",
            )
            W = W.astype(dtype)
        elif dtype == jnp.float32:
            Pv = jax.nn.one_hot(pv, npair, dtype=jnp.bfloat16)
            Po = jax.nn.one_hot(po, npair, dtype=jnp.bfloat16)

            def _split3(x):
                hi = x.astype(jnp.bfloat16)
                r1 = x - hi.astype(jnp.float32)
                lo = r1.astype(jnp.bfloat16)
                lo2 = (r1 - lo.astype(jnp.float32)).astype(jnp.bfloat16)
                return hi, lo, lo2

            T = sum(
                jnp.einsum(
                    "bvp,pq->bvq", Pv, h_k,
                    preferred_element_type=jnp.float32,
                )
                for h_k in _split3(hpair)
            )  # [B, n_v, npair] f32
            # The dominant HBM term is the [B, n_u, npair] one-hot Po
            # (~1.4 GB bf16 at Fe2S2 B=2048).  Stack T's three bf16
            # split terms along the v axis and contract them in ONE
            # einsum so Po streams through the MXU once instead of
            # three times (round-4: −2 of ~5.4 GB step traffic).
            n_v = pv.shape[1]
            T3 = jnp.concatenate(
                [t_k for t_k in _split3(T)], axis=1
            )  # [B, 3*n_v, npair] bf16
            W3 = jnp.einsum(
                "bup,bvp->buv", Po, T3,
                preferred_element_type=jnp.float32,
            )  # [B, n_u, 3*n_v] f32
            W = (
                W3.reshape(B, -1, 3, n_v).sum(2)
                if n_v > 0
                else W3[:, :, :0]
            )
        else:
            # f64 path (CPU tests/oracles): plain full precision
            Pv = jax.nn.one_hot(pv, npair, dtype=dtype)
            T = jnp.einsum("bvp,pq->bvq", Pv, hpair, precision=_HI)
            Po = jax.nn.one_hot(po, npair, dtype=dtype)
            W = jnp.einsum("bup,bvp->buv", Po, T, precision=_HI)
        uv = jnp.asarray(
            table.u_of_k.astype(np.int64) * table.vpairs.shape[0]
            + table.v_of_k
        )
        val_d = jnp.take(W.reshape(B, -1), uv, axis=-1)  # static idx
    else:
        val_d = jnp.take(h2e, _tri_index(p0, p1, q0, q1))  # [B, nd]
    # base parity counts: prefix at the four orbitals — order-free sum,
    # so the static-slot counts work for the (max, min) relabeling
    base = cnts[:, ns:, :].sum(-1)
    corr = (
        -(p0 < q0).astype(jnp.int32)
        - (p1 < q0)
        + (q1 < q0)
        - (p0 < q1)
        - (p1 < q1)
        + (q0 < q1)
    )
    sgn_d = _parity_from_count(base + corr).astype(dtype)
    hij_d = val_d * sgn_d

    hij = jnp.concatenate([hii[:, None], hij_s, hij_d], axis=-1)

    comb = None
    if with_comb:
        is_double = jnp.concatenate(
            [jnp.zeros(ns, bool), jnp.ones(nd, bool)]
        )
        exc = make_comb_bits(bits, orbs, is_double)  # [B, n_sd, sorb]
        comb = jnp.concatenate(
            [bits[:, None, :].astype(jnp.int8), exc], axis=1
        )
    return comb, hij


def hij_pairs(
    bra_bits: jax.Array,
    ket_bits: jax.Array,
    h1e: jax.Array,
    h2e: jax.Array,
    diag1: jax.Array,
    K: jax.Array,
    J: jax.Array,
) -> jax.Array:
    """General <bra|H|ket> for elementwise-paired batches [..., sorb].

    Handles excitation degree 0/1/2 (zero otherwise), matching
    get_Hij_cpu (hamiltonian.cpp:87-102).  Used by GFMC / CI-NQS /
    tests; the VMC hot path uses :func:`comb_hij` instead.
    """
    sorb = bra_bits.shape[-1]
    dtype = K.dtype
    bra = bra_bits.astype(jnp.int32)
    ket = ket_bits.astype(jnp.int32)
    d = jnp.bitwise_xor(bra, ket)
    cre = d & bra  # occupied in bra only
    ann = d & ket  # occupied in ket only
    ncre = cre.sum(-1)
    nann = ann.sum(-1)

    pref_bra = onv.prefix_occ(bra)
    pref_ket = onv.prefix_occ(ket)
    ar = jnp.arange(sorb, dtype=jnp.int32)
    big = jnp.int32(sorb)

    # positions of set bits (max and min), valid when the count matches
    def hi_lo(mask):
        hi = jnp.max(jnp.where(mask > 0, ar, -1), axis=-1)
        lo = jnp.min(jnp.where(mask > 0, ar, big), axis=-1)
        return jnp.clip(hi, 0, sorb - 1), jnp.clip(lo, 0, sorb - 1)

    p_hi, p_lo = hi_lo(cre)
    q_hi, q_lo = hi_lo(ann)

    # --- degree 0 ---
    hij0 = hij_diagonal(bra, diag1, K)

    # --- degree 1 ---  p = p_hi, q = q_hi
    # sum_{k in occ(bra)} <pk||qk> = occ · J[:, p*sorb+q]
    occb = bra.astype(dtype)
    pq = p_hi * sorb + q_hi
    j_col = jnp.moveaxis(jnp.take(J, pq, axis=1), 0, -1)  # [..., sorb]
    val1 = (occb * j_col).sum(-1) + h1e[p_hi, q_hi]
    s1 = _parity_from_count(
        jnp.take_along_axis(pref_bra, p_hi[..., None], -1)[..., 0]
        + jnp.take_along_axis(pref_ket, q_hi[..., None], -1)[..., 0]
    ).astype(dtype)
    hij1 = val1 * s1

    # --- degree 2 ---
    idx2 = _tri_index(p_hi, p_lo, q_hi, q_lo)
    val2 = jnp.take(h2e, idx2)
    s2 = _parity_from_count(
        jnp.take_along_axis(pref_bra, p_hi[..., None], -1)[..., 0]
        + jnp.take_along_axis(pref_bra, p_lo[..., None], -1)[..., 0]
        + jnp.take_along_axis(pref_ket, q_hi[..., None], -1)[..., 0]
        + jnp.take_along_axis(pref_ket, q_lo[..., None], -1)[..., 0]
    ).astype(dtype)
    hij2 = val2 * s2

    out = jnp.where(
        (ncre == 0) & (nann == 0),
        hij0,
        jnp.where(
            (ncre == 1) & (nann == 1),
            hij1,
            jnp.where((ncre == 2) & (nann == 2), hij2, jnp.zeros_like(hij0)),
        ),
    )
    return out


def hij_dense(
    bra_bits: jax.Array,
    ket_bits: jax.Array,
    h1e: jax.Array,
    h2e: jax.Array,
    diag1: jax.Array,
    K: jax.Array,
    J: jax.Array,
) -> jax.Array:
    """Dense [n, m] matrix <bra_i|H|ket_j> (reference get_hij_torch 2D)."""
    n = bra_bits.shape[0]
    m = ket_bits.shape[0]
    bra = jnp.broadcast_to(bra_bits[:, None, :], (n, m, bra_bits.shape[-1]))
    ket = jnp.broadcast_to(ket_bits[None, :, :], (n, m, ket_bits.shape[-1]))
    return hij_pairs(bra, ket, h1e, h2e, diag1, K, J)
