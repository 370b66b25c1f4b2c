"""Prefix-sharing fused forward for CHAIN Graph-MPS-RNN (round 4).

REDUCE local energy evaluates ψ on [B, 1 + C] rows where the C
connected children of sample n differ from it at ≤ 4 spin orbitals.
A child's recurrence therefore EQUALS the parent's until the first
touched site t_min — re-running those sites is pure waste (mean
~25-35% of all site-steps at Fe2S2 geometry).  The lane-batched kernel
cannot start each lane at its own t_min (lane-divergent control flow,
docs/DESIGN.md:114-139); the workable scheme implemented here:

  1. parent pass — the chain forward, additionally writing per-site
     histories to HBM: hidden h_t [norb, 2dp, B] and the scalar
     accumulators (log_amp, phase product, electron counters)
     [norb, 8, B] (≈16 MB at Fe2S2 B=2048 — negligible);
  2. children are sorted by t_min WITHIN their parent group and cut
     into TBc-lane blocks; each block belongs to ONE parent, so the
     whole block restarts at s0 = t_min of its first (sorted) child
     with the parent's state at s0−1 — a per-block BROADCAST, no
     per-lane gathers.  Lanes with t_min > s0 re-run [s0, t_min) on
     inputs identical to the parent's, reproducing the parent's
     recurrence exactly — correctness does not depend on the sort,
     only the savings do.
  3. the child kernel's site loop is a fori_loop with a DYNAMIC lower
     bound; per-site weights are fetched with dynamic leading-axis
     loads (pl.ds) from the same packed tensors as the static kernel.

Chain-only (single predecessor, no tensor coupling): exactly the
bench/production ladder configuration (the structured flagship uses
the static kernel).  Parity is bit-identical by construction: the
child block replays the same f32 op sequence the full forward would
run from site s0 (tests/test_fused_prefix.py pins it to
graph_mpsrnn_logpsi_fused).

MEASURED on-chip (2026-08-19, scripts/tpu_prefix_check.py, Fe2S2
dcut=48 B=2048 k=512/n=128): parity exact (|Δlog| ≤ 8e-6 vs flat) but
SLOWER — 91 ms/step vs 57 ms flat.  At norb=20 the skipped prefix
(~30% of site-steps) cannot pay for the smaller child lane block
(TBc=128 vs the flat kernel's 512 — 4x the grid steps at 1/4 the
lane efficiency) plus the 16 MB history round-trip and the dynamic
fori_loop the static kernel unrolls.  The path is kept OPT-IN
(VMCConfig.eloc_prefix / BENCH_MODE=prefix) as the geometry lever for
long chains (norb ≥ 64, where the prefix fraction and the per-block
site count both grow); it is NOT the production default.

Reference anchor: the ψ-evaluation half of get_comb_hij_fused's
consumers (vmc/energy/eloc.py:205-323) — the reference re-evaluates
every connected determinant from scratch.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pynqs_tpu.ops.fused_rnn import (
    _is_chain,
    _pack_weights,
    _round_up,
)

__all__ = [
    "ReducePrefixForward",
    "graph_mpsrnn_logpsi_fused_prefix",
    "prefix_available",
    "t_min_from_packed",
    "t_min_process_order",
    "sort_children_by_t_min",
]

_NEG = -1e30


def t_min_process_order(model, parent_bits, child_bits):
    """First process-order site index at which each child differs from
    its parent (norb if identical — dead/padding rows).

    parent_bits [B, sorb] 0/1; child_bits [B, C, sorb].  Pure VPU
    (elementwise + a static-permutation take + min-reduce) — no
    scalar-core gathers.
    """
    norb = model.norb
    pv = parent_bits.astype(jnp.int32)
    cv = child_bits.astype(jnp.int32)
    diff = cv != pv[:, None, :]  # [B, C, sorb]
    site_diff = diff[..., 0::2] | diff[..., 1::2]  # [B, C, norb]
    proc_diff = site_diff[..., np.asarray(model._order)]
    t_idx = jnp.arange(norb, dtype=jnp.int32)
    return jnp.min(
        jnp.where(proc_diff, t_idx, jnp.int32(norb)), axis=-1
    )  # [B, C]


def t_min_from_packed(model, opack: jax.Array, orb_width: int):
    """t_min for packed excitation quadruples (energy/eloc.py's
    ``opack`` layout: i | a<<w | j<<2w | b<<3w, spin-orbital indices,
    singles carry (i, a, i, a) — excitation.py:114).  Gather-free: the
    site→process-position map is applied with a one-hot compare-sum
    against the static inverse order (fuses into the reduce on the
    VPU).  Returns int32 of opack's shape."""
    norb = model.norb
    order = np.asarray(model._order)
    inv_order = np.empty(norb, np.int64)
    inv_order[order] = np.arange(norb)
    mask = (1 << orb_width) - 1
    t = jnp.full(opack.shape, norb, jnp.int32)
    if (inv_order == np.arange(norb)).all():
        for s in range(4):
            site = ((opack >> (orb_width * s)) & mask) >> 1
            t = jnp.minimum(t, site)
        return t
    iota = jnp.arange(norb, dtype=jnp.int32)
    inv = jnp.asarray(inv_order, jnp.int32)
    for s in range(4):
        site = ((opack >> (orb_width * s)) & mask) >> 1
        tpos = jnp.where(site[..., None] == iota, inv, norb).min(-1)
        t = jnp.minimum(t, tpos)
    return t


def sort_children_by_t_min(child_bits, t_min):
    """Sort each parent's children by t_min (ascending) and return
    (sorted_bits, sorted_t_min, inverse_perm) so callers can restore
    the original order of the returned log ψ rows:
    ``lp_c_orig = jnp.take_along_axis(lp_c_sorted, inv[..., None], 1)``
    (a [B, C, 2] take along the static-size child axis — cheap next to
    the forward).  Sorting only improves the savings; parity holds for
    any order.
    """
    order = jnp.argsort(t_min, axis=-1, stable=True)
    inv = jnp.argsort(order, axis=-1, stable=True)
    sb = jnp.take_along_axis(child_bits, order[..., None], axis=1)
    st = jnp.take_along_axis(t_min, order, axis=-1)
    return sb, st, inv


def prefix_available(model) -> bool:
    return (
        _is_chain(model)
        and not model.use_tensor
        and getattr(model, "maxp", 1) == 1
    )


def _site_math(
    t_f32, x, h, la, pre, pim, ua, ub, w_t, vcat_t, e_t, pw_t, sc_t,
    *, dp, d, norb, noa, nob, phase_mode, norm_mode, mmdt,
):
    """One chain site step on a [*, TB] lane block — the same f32 op
    sequence as ops/fused_rnn._kernel's chain body (kept in lockstep;
    the parity test enforces it)."""
    f32 = jnp.float32
    ix = [(x == float(v)).astype(f32) for v in range(4)]
    if mmdt == "bf16":
        z = jnp.dot(w_t, h.astype(jnp.bfloat16), preferred_element_type=f32)
    else:
        z = jnp.dot(
            w_t, h, preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )
    z = z + vcat_t

    zsq = z * z
    wsq = zsq * e_t
    lw = []
    ssq = jnp.zeros_like(la)
    for v in range(4):
        blk = slice(v * 2 * dp, (v + 1) * 2 * dp)
        ssq = ssq + jnp.sum(zsq[blk, :], 0, keepdims=True)
        w_v = jnp.sum(wsq[blk, :], 0, keepdims=True)
        lw.append(jnp.log(jnp.maximum(w_v, 1e-30)))
    rem = float(norb) - t_f32 - 1.0
    occ_a = ua + 1.0 <= float(noa)
    emp_a = float(noa) - ua <= rem
    occ_b = ub + 1.0 <= float(nob)
    emp_b = float(nob) - ub <= rem
    m = [emp_a & emp_b, occ_a & emp_b, emp_a & occ_b, occ_a & occ_b]
    lw = [jnp.where(m[v], lw[v], _NEG) for v in range(4)]
    mx = jnp.maximum(jnp.maximum(lw[0], lw[1]), jnp.maximum(lw[2], lw[3]))
    lse = mx + jnp.log(
        jnp.exp(lw[0] - mx)
        + jnp.exp(lw[1] - mx)
        + jnp.exp(lw[2] - mx)
        + jnp.exp(lw[3] - mx)
    )
    sel_lp = sum(ix[v] * lw[v] for v in range(4)) - lse
    la = la + 0.5 * sel_lp

    sel = (
        ix[0] * z[0 : 2 * dp, :]
        + ix[1] * z[2 * dp : 4 * dp, :]
        + ix[2] * z[4 * dp : 6 * dp, :]
        + ix[3] * z[6 * dp : 8 * dp, :]
    )
    if norm_mode == "mpsrnn":
        nrm = jax.lax.rsqrt(jnp.maximum(ssq / float(4 * d), 1e-30))
    else:
        nrm = jax.lax.rsqrt(
            jnp.maximum(jnp.sum(sel * sel, 0, keepdims=True), 1e-30)
        )
    sel = sel * nrm

    ph8 = jnp.dot(pw_t, sel, preferred_element_type=jnp.float32)
    if phase_mode == "arg":
        zr_p = ph8[0:1, :] + sc_t[0]
        zi_p = ph8[1:2, :] + sc_t[1]
        m2 = zr_p * zr_p + zi_p * zi_p
        ok = m2 > 1e-30
        mag = jax.lax.rsqrt(jnp.maximum(m2, 1e-30))
        fr = jnp.where(ok, zr_p * mag, 1.0)
        fi = jnp.where(ok, zi_p * mag, 0.0)
        pre, pim = pre * fr - pim * fi, pre * fi + pim * fr
    else:
        pre = pre + sum(
            ix[v] * (ph8[v : v + 1, :] + sc_t[v]) for v in range(4)
        )
    ua = ua + ix[1] + ix[3]
    ub = ub + ix[2] + ix[3]
    return sel, la, pre, pim, ua, ub


def _parent_kernel(
    sc_ref, vals_ref, W_ref, vcat_ref, E_ref, pw_ref,
    out_ref, hh_ref, sh_ref, *, static,
):
    norb, d, dp, noa, nob, phase_mode, norm_mode, mmdt = static
    TB = vals_ref.shape[1]
    f32 = jnp.float32
    h = jnp.zeros((2 * dp, TB), f32)
    la = jnp.zeros((1, TB), f32)
    # arg mode: pre/pim = running unit-phase product (init 1 + 0i);
    # linear mode: pre = additive phase accumulator (init 0)
    p0 = 1.0 if phase_mode == "arg" else 0.0
    pre = jnp.full((1, TB), p0, f32)
    pim = jnp.zeros((1, TB), f32)
    ua = jnp.zeros((1, TB), f32)
    ub = jnp.zeros((1, TB), f32)
    for t in range(norb):
        x = vals_ref[t : t + 1, :]
        h, la, pre, pim, ua, ub = _site_math(
            float(t), x, h, la, pre, pim, ua, ub,
            W_ref[t], vcat_ref[t], E_ref[t], pw_ref[t],
            [sc_ref[t, v] for v in range(4)],
            dp=dp, d=d, norb=norb, noa=noa, nob=nob,
            phase_mode=phase_mode, norm_mode=norm_mode, mmdt=mmdt,
        )
        hh_ref[t] = h
        zero = jnp.zeros((1, TB), f32)
        sh_ref[t] = jnp.concatenate(
            [la, pre, pim, ua, ub, zero, zero, zero], axis=0
        )
    zero = jnp.zeros((1, TB), f32)
    if phase_mode == "arg":
        rows = [la, pre, pim, zero, zero, zero, zero, zero]
    else:
        rows = [la, pre, zero, zero, zero, zero, zero, zero]
    out_ref[...] = jnp.concatenate(rows, axis=0)


def _child_kernel(
    s0_ref, sc_ref, vals_ref, W_ref, vcat_ref, E_ref, pw_ref,
    hh_ref, sh_ref, out_ref, *, static,
):
    norb, d, dp, noa, nob, phase_mode, norm_mode, mmdt, bpp, bw = static
    TB = vals_ref.shape[1]
    f32 = jnp.float32
    # s0_ref is a scalar-prefetch arg (whole [B*bpp] vector): Mosaic
    # rejects (1, 1) SMEM blocks over a tall array, so index by grid id
    g = pl.program_id(0)
    s0 = s0_ref[g]
    started = s0 > 0
    ip = jnp.maximum(s0 - 1, 0)
    # parent state at s0-1.  The history block carries ``bw`` parents on
    # the lane axis (Mosaic requires ≥128-lane or full-axis blocks);
    # pick this block's parent column with a one-hot lane mask + lane
    # reduce — pure VPU, no gathers.
    col = (g // bpp) % bw
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, bw), 1)
    msk = (lane == col).astype(f32)
    h_p = jnp.sum(hh_ref[pl.ds(ip, 1), :, :][0] * msk, 1, keepdims=True)
    s_p = jnp.sum(sh_ref[pl.ds(ip, 1), :, :][0] * msk, 1, keepdims=True)
    on = started.astype(f32)
    h = jnp.broadcast_to(h_p * on, (2 * dp, TB))
    p0 = 1.0 if phase_mode == "arg" else 0.0
    la = jnp.broadcast_to(s_p[0:1] * on, (1, TB))
    pre = jnp.broadcast_to(s_p[1:2] * on + (1.0 - on) * p0, (1, TB))
    pim = jnp.broadcast_to(s_p[2:3] * on, (1, TB))
    ua = jnp.broadcast_to(s_p[3:4] * on, (1, TB))
    ub = jnp.broadcast_to(s_p[4:5] * on, (1, TB))

    def body(t, carry):
        h, la, pre, pim, ua, ub = carry
        x = vals_ref[pl.ds(t, 1), :]
        w_t = W_ref[pl.ds(t, 1), :, :][0]
        vc_t = vcat_ref[pl.ds(t, 1), :, :][0]
        e_t = E_ref[pl.ds(t, 1), :, :][0]
        pw_t = pw_ref[pl.ds(t, 1), :, :][0]
        sc_t = [sc_ref[t, v] for v in range(4)]  # noqa: B023 (ref, not val)
        return _site_math(
            t.astype(f32), x, h, la, pre, pim, ua, ub,
            w_t, vc_t, e_t, pw_t, sc_t,
            dp=dp, d=d, norb=norb, noa=noa, nob=nob,
            phase_mode=phase_mode, norm_mode=norm_mode, mmdt=mmdt,
        )

    h, la, pre, pim, ua, ub = jax.lax.fori_loop(
        s0, norb, body, (h, la, pre, pim, ua, ub)
    )
    zero = jnp.zeros((1, TB), f32)
    if phase_mode == "arg":
        rows = [la, pre, pim, zero, zero, zero, zero, zero]
    else:
        rows = [la, pre, zero, zero, zero, zero, zero, zero]
    out_ref[...] = jnp.concatenate(rows, axis=0)


def _finish(model, params, out, bits_i):
    """Shared epilogue: rows -> (log|ψ|, arg) pairs + permutation sign
    and global phase (mirrors graph_mpsrnn_logpsi_fused's tail)."""
    from pynqs_tpu.ops import onv as onv_ops

    log_amp = out[0]
    if model.phase_mode == "arg":
        phase = jnp.arctan2(out[2], out[1])
    else:
        phase = out[1]
    sgn = onv_ops.permute_sgn(
        bits_i[:, np.asarray(model._so_order)], jnp.asarray(model._sgnA)
    )
    phase = phase + params["global_phase"].astype(jnp.float32) + jnp.pi * (
        1.0 - sgn
    ) / 2.0
    return jnp.stack([log_amp, phase], -1)


def graph_mpsrnn_logpsi_fused_prefix(
    model,
    params,
    parent_bits: jax.Array,
    child_bits: jax.Array,
    t_min: jax.Array,
    *,
    child_block: int = 128,
    parent_block: int = 512,
    interpret: bool = False,
    matmul_dtype=jnp.bfloat16,
):
    """Prefix-sharing forward.

    parent_bits [B, sorb]; child_bits [B, C, sorb] (children of parent
    b); t_min [B, C] int32 = the first PROCESS-ORDER site at which
    child differs from its parent (use sorb for dead/padding children —
    they skip every site and reproduce the parent's value cheaply).
    Children need NOT be sorted; sorting by t_min within each parent
    maximizes the savings.

    Returns (lp_parent [B, 2], lp_children [B, C, 2]) identical to the
    full fused forward on the same rows.
    """
    if not prefix_available(model):
        raise ValueError("prefix sharing supports chain GraphMPSRNN only")
    norb, d = model.norb, model.dcut
    if d <= 32:
        dp = 32
    elif d <= 48:
        dp = 48
    else:
        dp = _round_up(d, 64)
    B, C, sorb = child_bits.shape
    TBc = child_block
    Cp = _round_up(C, TBc)
    TBp = min(parent_block, _round_up(B, 8))
    Bp = _round_up(B, TBp)

    order = np.asarray(model._order)

    def vals_of(bits):
        bi = bits.astype(jnp.int32)
        v = (bi[..., 0::2] + 2 * bi[..., 1::2]).astype(jnp.float32)
        return v[..., order]  # process order: row t = site order[t]

    W, vcat, E, _R, PW, SC = _pack_weights(model, params, dp)
    if matmul_dtype == jnp.bfloat16:
        W = W.astype(jnp.bfloat16)
    mmdt = "bf16" if matmul_dtype == jnp.bfloat16 else "f32"
    static = (
        norb, d, dp, model.noa, model.nob, model.phase_mode,
        model.norm_mode, mmdt,
    )

    # ---- parent pass with histories ----
    pv = vals_of(parent_bits)  # [B, norb]
    if Bp != B:
        pv = jnp.concatenate(
            [pv, jnp.broadcast_to(pv[:1], (Bp - B, norb))], 0
        )
    inv = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    p_out, hh, sh = pl.pallas_call(
        partial(_parent_kernel, static=static),
        out_shape=(
            jax.ShapeDtypeStruct((8, Bp), jnp.float32),
            jax.ShapeDtypeStruct((norb, 2 * dp, Bp), jnp.float32),
            jax.ShapeDtypeStruct((norb, 8, Bp), jnp.float32),
        ),
        grid=(Bp // TBp,),
        in_specs=[
            pl.BlockSpec((norb, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((norb, TBp), lambda i: (0, i)),
            inv((norb, 8 * dp, 2 * dp)),
            inv((norb, 8 * dp, 1)),
            inv((norb, 8 * dp, 1)),
            inv((norb, 8, 2 * dp)),
        ],
        out_specs=(
            pl.BlockSpec((8, TBp), lambda i: (0, i)),
            pl.BlockSpec((norb, 2 * dp, TBp), lambda i: (0, 0, i)),
            pl.BlockSpec((norb, 8, TBp), lambda i: (0, 0, i)),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(SC, pv.T, W, vcat, E, PW)

    # ---- children ----
    cv = vals_of(child_bits.reshape(B * C, sorb)).reshape(B, C, norb)
    tm = jnp.minimum(t_min.astype(jnp.int32), norb)
    if Cp != C:
        cv = jnp.concatenate(
            [cv, jnp.broadcast_to(cv[:, :1], (B, Cp - C, norb))], 1
        )
        tm = jnp.concatenate(
            [tm, jnp.full((B, Cp - C), norb, jnp.int32)], 1
        )
    bpp = Cp // TBc
    # per-block start = min t_min over the block (sorted input -> first)
    s0 = tm.reshape(B, bpp, TBc).min(-1).reshape(B * bpp)
    # children laid out parent-major so block g covers parent g // bpp
    cv_flat = cv.reshape(B * Cp, norb).T  # [norb, B*Cp]
    # history blocks carry bw parents on the lane axis (Mosaic lane rule)
    bw = 128 if Bp % 128 == 0 else Bp

    # s0 rides scalar prefetch (whole vector, indexed by program_id in
    # the kernel); index maps take the scalar ref as a trailing arg
    c_out = pl.pallas_call(
        partial(_child_kernel, static=static + (bpp, bw)),
        out_shape=jax.ShapeDtypeStruct((8, B * Cp), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B * bpp,),
            in_specs=[
                pl.BlockSpec(
                    (norb, 4), lambda g, s: (0, 0), memory_space=pltpu.SMEM
                ),
                pl.BlockSpec((norb, TBc), lambda g, s: (0, g)),
                pl.BlockSpec(
                    (norb, 8 * dp, 2 * dp), lambda g, s: (0, 0, 0)
                ),
                pl.BlockSpec((norb, 8 * dp, 1), lambda g, s: (0, 0, 0)),
                pl.BlockSpec((norb, 8 * dp, 1), lambda g, s: (0, 0, 0)),
                pl.BlockSpec((norb, 8, 2 * dp), lambda g, s: (0, 0, 0)),
                pl.BlockSpec(
                    (norb, 2 * dp, bw),
                    lambda g, s, _bpp=bpp, _bw=bw: (
                        0, 0, (g // _bpp) // _bw
                    ),
                ),
                pl.BlockSpec(
                    (norb, 8, bw),
                    lambda g, s, _bpp=bpp, _bw=bw: (
                        0, 0, (g // _bpp) // _bw
                    ),
                ),
            ],
            out_specs=pl.BlockSpec((8, TBc), lambda g, s: (0, g)),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(s0, SC, cv_flat, W, vcat, E, PW, hh, sh)

    lp_p = _finish(
        model, params, p_out[:, :B], parent_bits.astype(jnp.int32)
    )
    lp_c = _finish(
        model, params, c_out[:, : B * Cp],
        child_bits.reshape(B * C, sorb).astype(jnp.int32)
        if Cp == C
        else jnp.concatenate(
            [
                child_bits,
                jnp.broadcast_to(
                    child_bits[:, :1], (B, Cp - C, sorb)
                ),
            ],
            1,
        ).reshape(B * Cp, sorb).astype(jnp.int32),
    )
    lp_c = lp_c.reshape(B, Cp, 2)[:, :C]
    return lp_p, lp_c


class ReducePrefixForward:
    """The ``prefix_fwd`` contract of
    energy/eloc.local_energy_reduce: bundles the prefix-sharing
    forward with the packed-quadruple t_min map (the eloc kernel has
    the packed payload but not the model's site order).

        pf = ReducePrefixForward(model, params)
        local_energy_reduce(fwd, bits, ..., prefix_fwd=pf)
    """

    def __init__(
        self,
        model,
        params,
        *,
        child_block: int = 128,
        parent_block: int = 512,
        matmul_dtype=jnp.bfloat16,
        interpret: bool = False,
    ):
        if not prefix_available(model):
            raise ValueError(
                "prefix sharing supports chain GraphMPSRNN only"
            )
        self.model = model
        self.params = params
        self.kw = dict(
            child_block=child_block,
            parent_block=parent_block,
            matmul_dtype=matmul_dtype,
            interpret=interpret,
        )

    def t_min_packed(self, opack, orb_width: int):
        return t_min_from_packed(self.model, opack, orb_width)

    def __call__(self, parent_bits, child_bits, t_min):
        return graph_mpsrnn_logpsi_fused_prefix(
            self.model, self.params, parent_bits, child_bits, t_min,
            **self.kw,
        )
