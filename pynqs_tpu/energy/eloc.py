"""Local-energy evaluation.

    E_loc(n) = Σ_m <n|H|m> ψ(m) / ψ(n)

over the statically-enumerable singles+doubles connected space
(1 + n_sd terms per sample; see pynqs_tpu.ops.excitation).

This is the TPU re-design of the reference's ``ElocMethod.SIMPLE``
strategy (vmc/energy/eloc.py:134-202): instead of dynamic
``torch.unique`` dedup plus a CUDA binary-search LUT, the connected
determinants are produced by the fused static-shape kernel
(ops/hamiltonian.comb_hij) and evaluated with a batched ansatz forward
under ``lax.map`` chunking.  Amplitude ratios are formed in log space:
exp(log ψ(m) − log ψ(n)).

The semi-stochastic REDUCE strategy (|Hnm| screening + multinomial
tail estimator, reference vmc/energy/eloc.py:205-323) and the
sample-space LUT strategy (:326-508) are provided in
``local_energy_reduce`` / ``local_energy_sample_space``.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from pynqs_tpu.ops import cplx
from pynqs_tpu.ops import onv as _onv_mod
from pynqs_tpu.ops.excitation import ExcitationTable
from pynqs_tpu.ops.hamiltonian import comb_hij

__all__ = [
    "local_energy_simple",
    "local_energy_simple_dedup",
    "dedup_eval",
    "local_energy_reduce",
    "reduce_unique_count",
    "local_energy_sample_space",
    "make_local_energy",
]


def _pad_rows(n: int, batch: int, *arrays):
    """Pad leading axis to the next multiple of ``batch`` by repeating
    row 0 (any valid determinant — padded results are sliced off), so
    arbitrary sample counts chunk cleanly (reference split_batch_idx,
    utils/public_function.py)."""
    pad = (-n) % batch
    if pad == 0:
        return arrays
    return tuple(
        jnp.concatenate([a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])])
        for a in arrays
    )


def local_energy_simple(
    log_psi_fn: Callable[[jax.Array], jax.Array],
    bits: jax.Array,
    tables: tuple,
    table: ExcitationTable,
    *,
    batch: int | None = None,
    hpair: jax.Array | None = None,
) -> jax.Array:
    """E_loc for a batch of samples. bits [B, sorb] -> pair [B, 2]
    (Re E_loc, Im E_loc).

    ``log_psi_fn`` returns (log|ψ|, arg ψ) pairs [N, 2] (see
    pynqs_tpu.ops.cplx — the TPU backend has no complex dtypes).
    ``tables`` = (h1e, h2e, diag1, K, J) device operands.
    ``batch``: eloc chunk size over the sample axis (memory control —
    the connected space is [chunk, 1+n_sd, sorb]); None = whole batch.
    """
    h1e, h2e, diag1, K, J = tables

    def chunk_eloc(chunk_bits):
        comb, hij = comb_hij(
            chunk_bits, h1e, h2e, diag1, K, J, hpair, table=table, with_comb=True
        )
        b, m, sorb = comb.shape
        lp = log_psi_fn(comb.reshape(b * m, sorb)).reshape(b, m, 2)
        r_re, r_im = cplx.ratio_re_im(lp, lp[:, :1])
        h = hij.astype(r_re.dtype)
        return jnp.stack([(h * r_re).sum(-1), (h * r_im).sum(-1)], -1)

    nb = bits.shape[0]
    if batch is None or batch >= nb:
        return chunk_eloc(bits)
    (bits,) = _pad_rows(nb, batch, bits)
    chunks = bits.reshape(-1, batch, bits.shape[-1])
    return jax.lax.map(chunk_eloc, chunks).reshape(-1, 2)[:nb]


def _excite_bits(bits, orbs, is_double):
    """Excited determinants for per-sample selected excitations.

    bits [B, sorb] 0/1; orbs [B, n, 4] (i, a, j, b); is_double [B, n]
    bool (per-sample, unlike ops.excitation.make_comb_bits's static
    flags).  Returns [B, n, sorb] int8.
    """
    sorb = bits.shape[-1]
    oh = jax.nn.one_hot(orbs, sorb, dtype=jnp.int8)  # [B, n, 4, sorb]
    flip_s = oh[..., 0, :] + oh[..., 1, :]
    flip_d = flip_s + oh[..., 2, :] + oh[..., 3, :]
    flips = jnp.where(is_double[..., None], flip_d, flip_s)
    return jnp.bitwise_xor(bits[:, None, :].astype(jnp.int8), flips % 2)


def _sample_tail_cdf_blkloc(key, resid, n_stoch: int, block: int = 128):
    """Stratified inverse-CDF draws with P(j) ∝ resid[:, j], returned
    as (block index [b, n_stoch], within-block offset [b, n_stoch]).

    The TPU replacement for jax.random.categorical (whose Gumbel trick
    broadcasts logits to [b, n_stoch, n_sd] — 54 ms at Fe2S2 scale):
    two-level search on the cumulative sum.  Level 1 counts block-end
    cumsums below u (a [b, n_stoch, nb] compare-reduce); level 2
    fetches the selected 128-wide cumsum block via an exact one-hot
    MXU matmul and counts within it.  No per-row gathers, nothing of
    size [b, n_stoch, n_sd] materialized.  Stratified uniforms
    u_s = (s + ξ_s)/n · total keep every draw's marginal ∝ resid
    (unbiased) with lower variance than iid draws.
    """
    b, n = resid.shape
    nb = -(-n // block)
    pad = nb * block - n
    r = jnp.pad(resid, [(0, 0), (0, pad)]) if pad else resid
    c = jnp.cumsum(r, axis=-1)  # [b, nb*block]
    total = c[:, -1:]
    xi = jax.random.uniform(key, (b, n_stoch), dtype=c.dtype)
    u = (jnp.arange(n_stoch, dtype=c.dtype)[None, :] + xi) / n_stoch * total
    cb = c.reshape(b, nb, block)
    cblk = cb[:, :, -1]  # block-end cumsums [b, nb]
    blk = jnp.minimum(
        (cblk[:, None, :] < u[:, :, None]).sum(-1).astype(jnp.int32), nb - 1
    )
    oh = jax.nn.one_hot(blk, nb, dtype=c.dtype)  # [b, n_stoch, nb]
    cand = jnp.einsum(
        "bsn,bnc->bsc", oh, cb, precision=jax.lax.Precision.HIGHEST
    )  # [b, n_stoch, block]
    loc = (cand < u[:, :, None]).sum(-1).astype(jnp.int32)
    return blk, jnp.minimum(loc, block - 1)


def _sample_tail_cdf(key, resid, n_stoch: int, block: int = 128):
    """Flat stratified inverse-CDF draw indices [b, n_stoch] — see
    :func:`_sample_tail_cdf_blkloc`."""
    b, n = resid.shape
    blk, loc = _sample_tail_cdf_blkloc(key, resid, n_stoch, block)
    return jnp.minimum(blk * block + loc, n - 1)


def _onehot_fetch_i32(blk, loc, flat_i32, block: int = 128):
    """Exact gather-free fetch of ``flat_i32[b, blk*block + loc]``.

    Per-row dynamic gathers run on the TPU scalar core (~5-9 ns/elem);
    instead the selected 128-wide block is pulled with one-hot MXU
    matmuls over FOUR 8-bit bf16 fields (integers ≤ 255 are exact in
    bf16; f32 einsums would silently truncate to bf16 at the TPU
    default precision), then the within-block element is an exact
    int32 mask-reduce on the VPU.  Values may use up to 31 bits.
    """
    b, n = flat_i32.shape
    nb = -(-n // block)
    pad = nb * block - n
    t = jnp.pad(flat_i32, [(0, 0), (0, pad)]) if pad else flat_i32
    tb = t.reshape(b, nb, block)
    ohb = jax.nn.one_hot(blk, nb, dtype=jnp.bfloat16)  # [b, s, nb]
    cand = jnp.zeros(blk.shape + (block,), jnp.int32)
    for shift in (0, 8, 16, 24):
        f = ((tb >> shift) & 0xFF).astype(jnp.bfloat16)
        cf = jnp.einsum(
            "bsn,bnc->bsc", ohb, f, preferred_element_type=jnp.float32
        )
        cand = cand | (cf.astype(jnp.int32) << shift)
    ohl = (
        loc[..., None]
        == jnp.arange(block, dtype=jnp.int32)[None, None, :]
    )
    return jnp.where(ohl, cand, 0).sum(-1)


def local_energy_reduce(
    log_psi_fn: Callable[[jax.Array], jax.Array],
    bits: jax.Array,
    tables: tuple,
    table: ExcitationTable,
    key: jax.Array,
    *,
    k_det: int = 256,
    n_stoch: int = 64,
    batch: int | None = None,
    hpair: jax.Array | None = None,
    topk: str = "exact",
    dedup_unique_max: int | None = None,
    pair_select: str = "auto",
    prefix_fwd: Callable | None = None,
) -> jax.Array:
    """Semi-stochastic screened E_loc (reference ElocMethod.REDUCE,
    vmc/energy/eloc.py:205-323), re-shaped for static-shape XLA:

    Instead of a data-dependent ε threshold (`gt_eps_idx`), the k_det
    largest |H_nm| terms per sample are summed exactly and the
    remaining tail is estimated unbiasedly with n_stoch multinomial
    draws ∝ |H_nm|:   Σ_tail H r  ≈  (S/n) Σ_s sign(H_s) r_s · S_norm,
    S = Σ_tail |H|.  NN forwards per sample drop from 1+n_sd to
    1 + k_det + n_stoch.

    TPU shape of the selection (round-2 rework): the full connected
    space [B, 1+n_sd, sorb] is never materialized — `comb_hij` runs
    with with_comb=False, the per-excitation orbital quadruples are
    packed 4×8-bit into ONE int32, so each selected term costs two
    gathered elements (packed orbs + H value) instead of sorb+1, and
    the selected determinants' bit rows are rebuilt by XOR afterwards.
    Cuts scalar-core gather traffic ~20× at Fe2S2 scale.

    ``topk``: "exact" (lax.top_k), "approx" (lax.approx_max_k — the
    TPU-optimized partial reduce), or "segmax" (sort-free strided
    segment winners — one max-reduce instead of a row sort).  Any
    deterministic top set keeps the estimator unbiased (the tail draw
    covers whatever remains); approx/segmax only perturb the variance
    split.

    ``prefix_fwd``: optional prefix-sharing forward
    ``(parent_bits [b, s], child_bits [b, C, s], t_min [b, C]) ->
    (lp_parent [b, 2], lp_children [b, C, 2])``
    (ops/fused_rnn_prefix.graph_mpsrnn_logpsi_fused_prefix partial).
    When set (slim packing only, sorb <= 127), the screened/tail
    children are sorted by t_min through ONE variadic lax.sort of the
    packed payload (the det and tail sums are order-invariant, so no
    inverse permutation is ever applied) and ψ is evaluated with the
    parent's recurrence prefix reused.  Mutually exclusive with
    ``dedup_unique_max``.
    """
    h1e, h2e, diag1, K, J = tables

    def chunk_eloc(args):
        chunk_bits, k = args
        _, hij = comb_hij(
            chunk_bits, h1e, h2e, diag1, K, J, hpair, table=table,
            with_comb=False, pair_select=pair_select,
        )
        b, sorb = chunk_bits.shape
        n_off = hij.shape[1] - 1
        ns = table.n_singles
        kd = min(k_det, n_off)
        hij_off = hij[:, 1:]
        absh = jnp.abs(hij_off)
        # 7-bit orbital packing leaves room for the Hij sign bit, so
        # one take_along_axis per selection carries (orbs, sign) and
        # |H| comes from the top-k values themselves — 3 scalar-core
        # gathers become 1 (round-3 selection-path rework)
        slim = sorb <= 127 and topk != "approx"
        ow = 7 if slim else 8
        use_prefix = prefix_fwd is not None and slim
        if prefix_fwd is not None and not slim:
            raise ValueError(
                "prefix_fwd requires the slim 7-bit packing "
                "(sorb <= 127, topk != 'approx')"
            )
        if use_prefix and dedup_unique_max:
            raise ValueError("prefix_fwd and dedup_unique_max are exclusive")

        # packed selection payload: (i | a<<w | j<<2w | b<<3w [| sign])
        merged = _onv_mod.merged_orbital_list(chunk_bits, table.noa, table.nob)
        orbs_all = jnp.take(merged, jnp.asarray(table.pos), axis=-1)
        opack = (
            orbs_all[..., 0]
            | (orbs_all[..., 1] << ow)
            | (orbs_all[..., 2] << (2 * ow))
            | (orbs_all[..., 3] << (3 * ow))
        ).astype(jnp.int32)  # [b, n_sd]
        if slim:
            opack = opack | jnp.where(hij_off < 0, jnp.int32(1) << 28, 0)

        def unpack_fields(op):
            orbs = jnp.stack(
                [(op >> (ow * s)) & ((1 << ow) - 1) for s in range(4)],
                axis=-1,
            )
            sgn = (
                1.0 - 2.0 * ((op >> 28) & 1).astype(absh.dtype)
                if slim
                else None
            )
            return orbs, sgn

        def unpack_sel(sel_idx):
            op = jnp.take_along_axis(opack, sel_idx, axis=1)
            orbs, sgn = unpack_fields(op)
            return _excite_bits(chunk_bits, orbs, sel_idx >= ns), sgn

        # deterministic top-k by |H|
        if topk == "segmax":
            # sort-free selection: strided segment winners.  Element j
            # belongs to segment j % kd; the deterministic set is the
            # per-segment argmax — NOT the exact global top-k, which is
            # admissible (any deterministic set keeps the estimator
            # unbiased; the tail draw covers whatever remains) and
            # replaces the O(n log n) row sort of lax.top_k with one
            # max-reduce + one-hot argmax, all VPU-friendly.  Big |H|
            # elements cluster in contiguous excitation-index blocks
            # (shared i,a pairs), so the stride decorrelates segments.
            L = -(-n_off // kd)
            pad = kd * L - n_off
            a2 = jnp.pad(absh, ((0, 0), (0, pad))).reshape(b, L, kd)
            top_abs = a2.max(axis=1)  # [b, kd]
            eqm = a2 == top_abs[:, None, :]
            first = (jnp.cumsum(eqm.astype(jnp.int32), axis=1) == 1) & eqm
            loc = (first * jnp.arange(L, dtype=jnp.int32)[None, :, None]).sum(
                axis=1
            )  # [b, kd] argmax along the stride
            top_idx = jnp.minimum(
                loc * kd + jnp.arange(kd, dtype=jnp.int32)[None, :], n_off - 1
            )
            in_top = first.reshape(b, L * kd)[:, :n_off]
            resid = jnp.where(in_top, 0.0, absh)
            if slim:
                # gather-free payload pickup: the winner mask IS the
                # one-hot over strides — an exact int32 mask-reduce on
                # the VPU replaces the [b, kd] scalar-core gather
                a2o = jnp.pad(opack, ((0, 0), (0, pad))).reshape(b, L, kd)
                op_sel = jnp.where(first, a2o, 0).sum(axis=1)  # [b, kd]
                flag_det = top_idx >= ns
                det_abs = top_abs
                if not use_prefix:
                    orbs_sel, det_sgn = unpack_fields(op_sel)
                    det_bits = _excite_bits(chunk_bits, orbs_sel, flag_det)
                    det_h = det_sgn * top_abs
            else:
                det_bits, _ = unpack_sel(top_idx)
                det_h = jnp.take_along_axis(hij_off, top_idx, axis=1)
        else:
            if topk == "approx":
                top_abs, top_idx = jax.lax.approx_max_k(absh, kd)
            else:
                top_abs, top_idx = jax.lax.top_k(absh, kd)  # [b, kd]
            if use_prefix:
                op_sel = jnp.take_along_axis(opack, top_idx, axis=1)
                flag_det = top_idx >= ns
                det_abs = top_abs
            else:
                det_bits, det_sgn = unpack_sel(top_idx)  # [b, kd, sorb]

            if slim:
                if not use_prefix:
                    det_h = det_sgn * top_abs
                # residual tail WITHOUT a scatter: lax.top_k breaks ties
                # by lowest index, so the selected set is exactly
                # {|H| > thr} plus the first (kd - #greater) ties
                thr = top_abs[:, -1:]
                gt = absh > thr
                c1 = gt.sum(-1, keepdims=True)
                eq = absh == thr
                eq_excl = jnp.cumsum(eq.astype(jnp.int32), axis=-1) - eq.astype(
                    jnp.int32
                )
                in_top = gt | (eq & (eq_excl < (kd - c1)))
                resid = jnp.where(in_top, 0.0, absh)
            else:
                det_h = jnp.take_along_axis(hij_off, top_idx, axis=1)
                resid = absh.at[jnp.arange(b)[:, None], top_idx].set(0.0)
        s_tail = resid.sum(-1)  # [b]
        blk_t, loc_t = _sample_tail_cdf_blkloc(k, resid, n_stoch)
        draw = jnp.minimum(blk_t * 128 + loc_t, n_off - 1)  # [b, n_stoch]
        if slim:
            # gather-free tail payload: one-hot block fetch (exact
            # 8-bit bf16 fields) instead of the [b, n_stoch] gather
            op_t = _onehot_fetch_i32(blk_t, loc_t, opack)
            if not use_prefix:
                orbs_t, st_sgn = unpack_fields(op_t)
                st_bits = _excite_bits(chunk_bits, orbs_t, draw >= ns)
                st_h = st_sgn  # only the sign enters the tail estimator
        else:
            st_bits, _ = unpack_sel(draw)
            st_h = jnp.take_along_axis(hij_off, draw, axis=1)

        if use_prefix:
            # prefix-sharing forward: sort the det and tail payloads by
            # t_min through ONE variadic sort each (no inverse perm —
            # the det/tail sums below are order-invariant), rebuild the
            # child bit rows from the sorted payload, and reuse the
            # parent's recurrence prefix per child block.
            t_det = prefix_fwd.t_min_packed(op_sel, ow)
            t_det, op_sel, fd, det_abs_s = jax.lax.sort(
                (t_det, op_sel, flag_det.astype(jnp.int32),
                 det_abs.astype(jnp.float32)),
                dimension=1, num_keys=1,
            )
            orbs_sel, det_sgn = unpack_fields(op_sel)
            det_bits = _excite_bits(chunk_bits, orbs_sel, fd == 1)
            det_h = det_sgn * det_abs_s.astype(det_sgn.dtype)
            t_t = prefix_fwd.t_min_packed(op_t, ow)
            flag_t = draw >= ns
            t_t, op_t, ft = jax.lax.sort(
                (t_t, op_t, flag_t.astype(jnp.int32)), dimension=1,
                num_keys=1,
            )
            orbs_t, st_sgn = unpack_fields(op_t)
            st_bits = _excite_bits(chunk_bits, orbs_t, ft == 1)
            st_h = st_sgn
            kids = jnp.concatenate([det_bits, st_bits], axis=1)
            t_all = jnp.concatenate([t_det, t_t], axis=1)
            lp_p, lp_c = prefix_fwd(chunk_bits, kids, t_all)
            lp = jnp.concatenate([lp_p[:, None, :], lp_c], axis=1)
        else:
            # one fused forward over [self | det | stoch]
            all_bits = jnp.concatenate(
                [chunk_bits[:, None, :], det_bits, st_bits], axis=1
            )
            flat = all_bits.reshape(b * (1 + kd + n_stoch), sorb)
            if dedup_unique_max:
                # peaked states' samples share most of their screened
                # connected determinants — evaluate ψ once per unique
                # row (reference Func/use_unique,
                # vmc/energy/flip.py:29-63).  Static-capacity contract:
                # validate dedup_unique_max on your state with
                # energy/eloc.reduce_unique_count.
                lp, _nu = dedup_eval(log_psi_fn, flat, dedup_unique_max)
                lp = lp.reshape(b, 1 + kd + n_stoch, 2)
            else:
                lp = log_psi_fn(flat).reshape(b, 1 + kd + n_stoch, 2)
        r_re, r_im = cplx.ratio_re_im(lp, lp[:, :1])
        e_diag = hij[:, 0].astype(r_re.dtype)
        det_hr = det_h.astype(r_re.dtype)
        e_det_re = (det_hr * r_re[:, 1 : 1 + kd]).sum(-1)
        e_det_im = (det_hr * r_im[:, 1 : 1 + kd]).sum(-1)
        sgn = jnp.sign(st_h).astype(r_re.dtype)
        has_tail = s_tail > 0
        scale = jnp.where(has_tail, s_tail.astype(r_re.dtype) / n_stoch, 0.0)
        e_tail_re = scale * (sgn * r_re[:, 1 + kd :]).sum(-1)
        e_tail_im = scale * (sgn * r_im[:, 1 + kd :]).sum(-1)
        return jnp.stack(
            [e_diag + e_det_re + e_tail_re, e_det_im + e_tail_im], -1
        )

    nb = bits.shape[0]
    if batch is None or batch >= nb:
        return chunk_eloc((bits, key))
    (bits,) = _pad_rows(nb, batch, bits)
    chunks = bits.reshape(-1, batch, bits.shape[-1])
    keys = jax.random.split(key, chunks.shape[0])
    return jax.lax.map(chunk_eloc, (chunks, keys)).reshape(-1, 2)[:nb]


def reduce_unique_count(
    bits: jax.Array,
    tables: tuple,
    table: ExcitationTable,
    key: jax.Array,
    *,
    k_det: int = 256,
    n_stoch: int = 64,
    batch: int | None = None,
    hpair: jax.Array | None = None,
) -> jax.Array:
    """Unique forward rows the REDUCE selection produces per chunk —
    sizes ``dedup_unique_max`` for :func:`local_energy_reduce` (static
    capacities are the XLA contract; validate, then pin).  Returns the
    per-chunk unique counts [n_chunks]."""
    counts = []

    def probe(lp_fn_rows):
        # replace the forward with a row-counting probe
        return jnp.zeros((lp_fn_rows.shape[0], 2), jnp.float32)

    nb = bits.shape[0]
    b = batch or nb
    (padded,) = _pad_rows(nb, b, bits)
    chunks = padded.reshape(-1, b, bits.shape[-1])
    keys = jax.random.split(key, chunks.shape[0])
    for i in range(chunks.shape[0]):
        got = {}

        def spy(rows):
            from pynqs_tpu.ops import lut as _lut

            packed = _onv_mod.pack_bits(rows)
            srt, _ = _lut.sort_onv(packed, jnp.arange(rows.shape[0], dtype=jnp.int32))
            is_new = jnp.concatenate(
                [jnp.ones((1,), bool), (srt[1:] != srt[:-1]).any(-1)]
            )
            got["n"] = is_new.sum()
            return probe(rows)

        local_energy_reduce(
            spy, chunks[i], tables, table, keys[i],
            k_det=k_det, n_stoch=n_stoch, hpair=hpair,
        )
        counts.append(got["n"])
    return jnp.stack(counts)


def dedup_eval(
    log_psi_fn: Callable[[jax.Array], jax.Array],
    flat_bits: jax.Array,
    n_unique_max: int,
):
    """Evaluate log ψ once per UNIQUE row of flat_bits [N, sorb].

    TPU shape (no dynamic unique): sort the packed ONV keys (payload =
    flat position), mark segment starts, compact the ≤ ``n_unique_max``
    first-occurrence rows with a second sort, run ONE forward, then
    unsort by position (a third sort).  Returns (lp [N, 2], n_unique);
    if n_unique exceeds n_unique_max the overflowed keys get the wrong
    values — check the returned count (static shapes are the XLA
    contract, no silent growth).
    """
    from pynqs_tpu.ops import lut as _lut

    N, sorb = flat_bits.shape
    packed = _onv_mod.pack_bits(flat_bits)  # [N, nw]
    nw = packed.shape[-1]
    sorted_keys, pos = _lut.sort_onv(packed, jnp.arange(N, dtype=jnp.int32))
    is_new = jnp.concatenate(
        [
            jnp.ones((1,), bool),
            (sorted_keys[1:] != sorted_keys[:-1]).any(-1),
        ]
    )
    seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # [N], sorted ascending
    n_unique = is_new.sum()
    overflow = seg >= n_unique_max  # rows beyond the static capacity

    # compact the first-occurrence rows into [n_unique_max, nw]
    order2 = jnp.where(is_new, seg, N)
    ops2 = (order2, *[sorted_keys[:, w] for w in range(nw)])
    out2 = jax.lax.sort(ops2, dimension=0, is_stable=True, num_keys=1)
    uniq = jnp.stack(out2[1:], axis=-1)[:n_unique_max]  # [U, nw]
    uniq_bits = _onv_mod.unpack_bits(uniq, sorb).astype(jnp.int8)
    lp_u = log_psi_fn(uniq_bits)  # [U, 2]

    lp_sorted = jnp.take(lp_u, jnp.clip(seg, 0, n_unique_max - 1), axis=0)
    # capacity overflow is made LOUD, not silently wrong: NaN poisons
    # the downstream energy, which the VMC/GFMC NaN guards abort on
    lp_sorted = jnp.where(overflow[:, None], jnp.nan, lp_sorted)
    # unsort to the original flat order (sort by position payload)
    back = jax.lax.sort(
        (pos, lp_sorted[:, 0], lp_sorted[:, 1]), dimension=0, num_keys=1
    )
    return jnp.stack([back[1], back[2]], axis=-1), n_unique


def local_energy_simple_dedup(
    log_psi_fn: Callable[[jax.Array], jax.Array],
    bits: jax.Array,
    tables: tuple,
    table: ExcitationTable,
    *,
    n_unique_max: int,
    hpair: jax.Array | None = None,
):
    """SIMPLE local energy with connected-space deduplication.

    The reference's ``Func`` evaluation (vmc/energy/flip.py:29-63):
    the [B, 1+n_sd] connected determinants of different samples overlap
    heavily, so ψ is evaluated ONCE per unique determinant (see
    :func:`dedup_eval`).  Returns (eloc [B, 2], n_unique).
    """
    h1e, h2e, diag1, K, J = tables
    comb, hij = comb_hij(
        bits, h1e, h2e, diag1, K, J, hpair, table=table, with_comb=True
    )
    b, m, sorb = comb.shape
    lp, n_unique = dedup_eval(
        log_psi_fn, comb.reshape(b * m, sorb), n_unique_max
    )
    lp = lp.reshape(b, m, 2)
    r_re, r_im = cplx.ratio_re_im(lp, lp[:, :1])
    h = hij.astype(r_re.dtype)
    eloc = jnp.stack([(h * r_re).sum(-1), (h * r_im).sum(-1)], -1)
    return eloc, n_unique


def local_energy_sample_space(
    bits: jax.Array,
    log_psi: jax.Array,
    lut,
    tables: tuple,
    table: ExcitationTable,
    *,
    batch: int | None = None,
    hpair: jax.Array | None = None,
) -> jax.Array:
    """Sample-space E_loc (reference ElocMethod.SAMPLE_SPACE,
    vmc/energy/eloc.py:326-508): ψ(m) only for m inside the sampled
    determinant set — ZERO extra NN forwards; the fused comb+Hij kernel
    plus one LUT bisection per connected determinant.

    ``bits``/``log_psi``: the unique sampled determinants and their
    amplitudes; ``lut``: WavefunctionLUT built over exactly those.
    """
    from pynqs_tpu.ops import onv as _onv

    h1e, h2e, diag1, K, J = tables

    def chunk_eloc(args):
        chunk_bits, chunk_lp = args
        comb, hij = comb_hij(
            chunk_bits, h1e, h2e, diag1, K, J, hpair, table=table, with_comb=True
        )
        b, m, sorb = comb.shape
        packed = _onv.pack_bits(comb[:, 1:, :].reshape(b * (m - 1), sorb))
        vals, found = lut.lookup_packed(packed)  # vals [N, 2] pairs
        lp_m = vals.reshape(b, m - 1, 2)
        found = found.reshape(b, m - 1)
        r_re, r_im = cplx.ratio_re_im(lp_m, chunk_lp[:, None, :])
        r_re = jnp.where(found, r_re, 0.0)
        r_im = jnp.where(found, r_im, 0.0)
        h = hij[:, 1:].astype(r_re.dtype)
        return jnp.stack(
            [
                hij[:, 0].astype(r_re.dtype) + (h * r_re).sum(-1),
                (h * r_im).sum(-1),
            ],
            -1,
        )

    nb = bits.shape[0]
    if batch is None or batch >= nb:
        return chunk_eloc((bits, log_psi))
    bits, log_psi = _pad_rows(nb, batch, bits, log_psi)
    chunks = bits.reshape(-1, batch, bits.shape[-1])
    lps = log_psi.reshape(-1, batch, 2)
    return jax.lax.map(chunk_eloc, (chunks, lps)).reshape(-1, 2)[:nb]


def make_local_energy(
    model,
    table: ExcitationTable,
    tables: tuple,
    *,
    method: str = "simple",
    batch: int | None = None,
):
    """Bind a model + system into eloc(params, bits, ...) -> complex [B].

    method "simple" -> eloc(params, bits);
    method "reduce" -> eloc(params, bits, key);
    "sample_space" is stateful over the sampled set — call
    :func:`local_energy_sample_space` directly with a WavefunctionLUT.
    """
    if method == "simple":

        def eloc(params, bits):
            fn = partial(model.log_psi, params)
            return local_energy_simple(fn, bits, tables, table, batch=batch)

        return eloc
    if method == "reduce":

        def eloc_r(params, bits, key, **kw):
            fn = partial(model.log_psi, params)
            return local_energy_reduce(
                fn, bits, tables, table, key, batch=batch, **kw
            )

        return eloc_r
    raise NotImplementedError(f"eloc method {method!r}")
