"""Pallas fully-fused Graph-MPS-RNN teacher-forced forward.

The XLA site-loop forward (models/graph_mps_rnn.py:log_psi) materializes
the per-site candidate hiddens [B, 4, d] (re+im) in HBM every step —
measured 3.9e6 rows/s at Fe2S2 dcut=48 (~3% of MXU peak), making the
ansatz forward the dominant cost of the REDUCE local energy.  This
kernel keeps the whole recurrence on-chip, in a TRANSPOSED layout:

  * batch rows live along the LANE axis — hidden state [2*dp, TB],
    per-row scalars [1, TB] — so the long per-site chain of scalar work
    (conditional log-probs, (N, Sz) masks, phase products) runs at full
    VPU lane width.  In the row-major layout those are [TB, 1] column
    ops at 1/128 lane efficiency and dominate the kernel (~28 ms of the
    first implementation's 38 ms).
  * each site's complex transition  h̃(x) = Σ_p M_{p,x} h_p + v_x  for
    all 4 values x is ONE MXU matmul  W[t] ([8*dp, 2*mp*dp]) @ u
    ([2*mp*dp, TB]), f32 accumulate; d is zero-padded to dp (multiple
    of 64) so per-value blocks are aligned sublane slices,
  * for chain graphs (the Fe2S2 flagship) the hidden state stays in a
    register — no VMEM register file at all,
  * per-site phases accumulate as a complex unit product
    Π_t ẑ_t/|ẑ_t| — one atan2 OUTSIDE the kernel recovers the total
    phase mod 2π (all log ψ needs).

HBM traffic per row: norb f32 in + 8 f32 out (vs ~36·norb·d before).

Gradients are NOT defined for this op; it serves the gradient-free
ψ(m)/ψ(n) ratio forwards of the local energy (the [B] sampled rows that
need ∂/∂θ keep the XLA forward).  Reference for semantics:
vmc/ansatz/rnn/graph_mpsrnn.py forward (983-1148).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["graph_mpsrnn_logpsi_fused", "fused_forward_available"]

_NEG = -1e30
_HI = jax.lax.Precision.HIGHEST


def fused_forward_available(model) -> bool:
    return (
        type(model).__name__ == "GraphMPSRNN"
        and not model.use_tensor
        and model.sites_per_step == 2
    )


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _is_chain(model) -> bool:
    norb = model.norb
    return model.maxp == 1 and all(
        int(model._pred[t][0]) == int(model._order[t - 1])
        for t in range(1, norb)
    )


def _pack_weights(model, params, dp: int):
    """Kernel-layout parameter tables (transposed: features × inputs).

    W    [norb, 8*dp, 2*mp*dp]: out rows x-major ([x*2dp, x*2dp+dp) =
         re, +dp = im), in columns pred-major ([p*2dp, p*2dp+dp) = re
         of pred p, +dp = im).
    vcat [norb, 8*dp, 1], E (softplus η) [norb, 8*dp, 1],
    PW   [norb, 8, 2*dp] phase matmul rows, SC [norb, 4] SMEM scalars.
    """
    norb, d, mp = model.norb, model.dcut, model.maxp
    dt = jnp.float32
    M_re = params["M_re"].astype(dt)  # [norb, mp, 4, d(out), d(in)]
    M_im = params["M_im"].astype(dt)
    pmask = jnp.asarray(model._pred_mask, dt)
    M_re = M_re * pmask[:, :, None, None, None]
    M_im = M_im * pmask[:, :, None, None, None]
    pad = [(0, 0), (0, 0), (0, 0), (0, dp - d), (0, dp - d)]
    M_re = jnp.pad(M_re, pad)  # [norb, mp, 4, dp, dp]
    M_im = jnp.pad(M_im, pad)
    # out-rows (x, re|im, dd) × in-cols (p, re|im, e):
    #   z_re = M_re h_re - M_im h_im ;  z_im = M_im h_re + M_re h_im
    row_re = jnp.stack([M_re, -M_im], axis=4)  # [norb,mp,4,dp,2,dp]
    row_im = jnp.stack([M_im, M_re], axis=4)
    Wt = jnp.stack([row_re, row_im], axis=3)  # [norb,mp,4,2,dp,2,dp]
    # -> [norb, (4,2,dp) out, (mp,2,dp) in]
    Wt = jnp.transpose(Wt, (0, 2, 3, 4, 1, 5, 6)).reshape(
        norb, 8 * dp, 2 * mp * dp
    )
    v_re = jnp.pad(params["v_re"].astype(dt), [(0, 0), (0, 0), (0, dp - d)])
    v_im = jnp.pad(params["v_im"].astype(dt), [(0, 0), (0, 0), (0, dp - d)])
    vcat = jnp.stack([v_re, v_im], axis=2).reshape(norb, 8 * dp, 1)

    eta = jax.nn.softplus(params["eta"].astype(dt))  # [norb, 4, d]
    eta = jnp.pad(eta, [(0, 0), (0, 0), (0, dp - d)])
    E = jnp.stack([eta, eta], axis=2).reshape(norb, 8 * dp, 1)

    if model.phase_mode == "arg":
        wr = jnp.pad(params["w_arg_re"].astype(dt), [(0, 0), (0, dp - d)])
        wi = jnp.pad(params["w_arg_im"].astype(dt), [(0, 0), (0, dp - d)])
        # matmul rows: 0 = [wr | -wi] (→ Re z), 1 = [wi | wr] (→ Im z)
        PW = jnp.stack(
            [
                jnp.concatenate([wr, -wi], axis=1),
                jnp.concatenate([wi, wr], axis=1),
            ],
            axis=1,
        )  # [norb, 2, 2dp]
        PW = jnp.concatenate(
            [PW, jnp.zeros((norb, 6, 2 * dp), dt)], axis=1
        )  # [norb, 8, 2dp]
        SC = jnp.stack(
            [
                params["c_arg_re"].astype(dt),
                params["c_arg_im"].astype(dt),
                jnp.zeros((norb,), dt),
                jnp.zeros((norb,), dt),
            ],
            axis=-1,
        )
    else:
        w = params["w_ph"].astype(dt)  # [norb, 4, 2d]
        w_re = jnp.pad(w[..., :d], [(0, 0), (0, 0), (0, dp - d)])
        w_im = jnp.pad(w[..., d:], [(0, 0), (0, 0), (0, dp - d)])
        PW = jnp.concatenate([w_re, w_im], axis=-1)  # [norb, 4, 2dp]
        PW = jnp.concatenate(
            [PW, jnp.zeros((norb, 4, 2 * dp), dt)], axis=1
        )  # [norb, 8, 2dp]
        SC = params["c_ph"].astype(dt)  # [norb, 4]
    return Wt, vcat, E, PW, SC


def _kernel(
    sc_ref,  # SMEM [norb, 4] f32
    vals_ref,  # [norb, TB] f32 (site values 0..3, canonical site index)
    W_ref,  # [norb, 8*dp, 2*mp*dp]
    vcat_ref,  # [norb, 8*dp, 1] f32 bias columns
    E_ref,  # [norb, 8*dp, 1] f32 softplus(η)
    pw_ref,  # [norb, 8, 2*dp] f32 phase matmul rows
    out_ref,  # [8, TB] f32
    hbuf,  # scratch [norb, 2*dp, TB] f32 (non-chain graphs)
    *,
    model_static,
):
    (order, pred, norb, d, dp, mp, noa, nob, phase_mode, norm_mode, mmdt) = (
        model_static
    )
    TB = vals_ref.shape[1]
    f32 = jnp.float32
    chain = mp == 1 and all(
        int(pred[t][0]) == int(order[t - 1]) for t in range(1, norb)
    )

    h_reg = jnp.zeros((2 * dp, TB), f32)
    if not chain:
        hbuf[...] = jnp.zeros((norb, 2 * dp, TB), f32)
    log_amp = jnp.zeros((1, TB), f32)
    pr_re = jnp.ones((1, TB), f32)
    pr_im = jnp.zeros((1, TB), f32)
    ph_lin = jnp.zeros((1, TB), f32)
    used_a = jnp.zeros((1, TB), f32)
    used_b = jnp.zeros((1, TB), f32)

    for t in range(norb):
        s = int(order[t])
        x = vals_ref[s : s + 1, :]  # [1, TB] f32 in {0..3}
        ix = [(x == float(v)).astype(f32) for v in range(4)]

        # ---- transition ----
        if chain:
            u = h_reg
        else:
            u = jnp.concatenate(
                [hbuf[int(pred[t][j])] for j in range(mp)], axis=0
            )  # [2*mp*dp, TB]
        w_t = W_ref[t]
        if mmdt == "bf16":
            z = jnp.dot(
                w_t, u.astype(jnp.bfloat16), preferred_element_type=f32
            )
        else:
            z = jnp.dot(w_t, u, preferred_element_type=f32, precision=_HI)
        z = z + vcat_ref[t]  # [8*dp, TB] + [8*dp, 1]

        # ---- per-value weights: η-weighted block sublane sums ----
        zsq = z * z
        wsq = zsq * E_ref[t]
        lw = []
        ssq = jnp.zeros((1, TB), f32)
        for v in range(4):
            blk = slice(v * 2 * dp, (v + 1) * 2 * dp)
            ssq = ssq + jnp.sum(zsq[blk, :], 0, keepdims=True)
            w_v = jnp.sum(wsq[blk, :], 0, keepdims=True)
            lw.append(jnp.log(jnp.maximum(w_v, 1e-30)))
        rem = float(norb - t - 1)
        occ_a = used_a + 1.0 <= float(noa)
        emp_a = float(noa) - used_a <= rem
        occ_b = used_b + 1.0 <= float(nob)
        emp_b = float(nob) - used_b <= rem
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
        log_amp = log_amp + 0.5 * sel_lp

        # ---- select hidden (aligned sublane blocks) + gauge ----
        sel = (
            ix[0] * z[0 : 2 * dp, :]
            + ix[1] * z[2 * dp : 4 * dp, :]
            + ix[2] * z[4 * dp : 6 * dp, :]
            + ix[3] * z[6 * dp : 8 * dp, :]
        )  # [2dp, TB] = [re ; im]
        if norm_mode == "mpsrnn":
            nrm = jax.lax.rsqrt(jnp.maximum(ssq / float(4 * d), 1e-30))
        else:
            nrm = jax.lax.rsqrt(
                jnp.maximum(jnp.sum(sel * sel, 0, keepdims=True), 1e-30)
            )
        sel = sel * nrm
        if chain:
            h_reg = sel
        else:
            hbuf[s] = sel

        # ---- phase (one [8, 2dp] @ [2dp, TB] MXU dot) ----
        ph8 = jnp.dot(pw_ref[t], sel, preferred_element_type=f32)
        if phase_mode == "arg":
            zr_p = ph8[0:1, :] + sc_ref[t, 0]
            zi_p = ph8[1:2, :] + sc_ref[t, 1]
            # z == 0 must contribute phase 0 (atan2(0,0) = 0, the model
            # semantics — DMRG imports zero every site's phase readout
            # except the last); the floored product would otherwise
            # collapse to 0 and destroy all later phase information
            m2 = zr_p * zr_p + zi_p * zi_p
            ok = m2 > 1e-30
            mag = jax.lax.rsqrt(jnp.maximum(m2, 1e-30))
            fr = jnp.where(ok, zr_p * mag, 1.0)
            fi = jnp.where(ok, zi_p * mag, 0.0)
            nr = pr_re * fr - pr_im * fi
            ni = pr_re * fi + pr_im * fr
            pr_re, pr_im = nr, ni
        else:
            contrib = sum(
                ix[v] * (ph8[v : v + 1, :] + sc_ref[t, v]) for v in range(4)
            )
            ph_lin = ph_lin + contrib

        used_a = used_a + ix[1] + ix[3]
        used_b = used_b + ix[2] + ix[3]

    zero = jnp.zeros((1, TB), f32)
    if phase_mode == "arg":
        rows = [log_amp, pr_re, pr_im, zero, zero, zero, zero, zero]
    else:
        rows = [log_amp, ph_lin, zero, zero, zero, zero, zero, zero]
    out_ref[...] = jnp.concatenate(rows, axis=0)


def graph_mpsrnn_logpsi_fused(
    model,
    params,
    bits: jax.Array,
    *,
    block_rows: int = 512,
    interpret: bool = False,
    matmul_dtype=jnp.bfloat16,
) -> jax.Array:
    """Drop-in (gradient-free) replacement for model.log_psi.

    bits [N, sorb] 0/1 -> pair [N, 2] (log|ψ|, arg ψ).
    ``matmul_dtype``: bf16 (default; matches the TPU default-precision
    matmul semantics of the XLA forward) or f32 for exact agreement.
    """
    if not fused_forward_available(model):
        raise ValueError("fused forward supports GraphMPSRNN w/o tensor")
    norb, d, mp = model.norb, model.dcut, model.maxp
    dp = _round_up(d, 64)
    N = bits.shape[0]
    TB = block_rows
    n_pad = _round_up(N, TB)

    bits_i = bits.astype(jnp.int32)
    vals = (bits_i[:, 0::2] + 2 * bits_i[:, 1::2]).astype(jnp.float32)
    if n_pad != N:
        vals = jnp.concatenate(
            [vals, jnp.broadcast_to(vals[:1], (n_pad - N, norb))], 0
        )
    vals_t = vals.T  # [norb, n_pad]

    W, vcat, E, PW, SC = _pack_weights(model, params, dp)
    if matmul_dtype == jnp.bfloat16:
        W = W.astype(jnp.bfloat16)  # halves VMEM residency

    mmdt = "bf16" if matmul_dtype == jnp.bfloat16 else "f32"
    model_static = (
        tuple(model._order),
        tuple(tuple(int(v) for v in row) for row in model._pred),
        norb, d, dp, mp, model.noa, model.nob,
        model.phase_mode, model.norm_mode, mmdt,
    )
    kern = partial(_kernel, model_static=model_static)

    grid = (n_pad // TB,)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((norb, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((norb, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (norb, 8 * dp, 2 * mp * dp), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (norb, 8 * dp, 1), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (norb, 8 * dp, 1), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (norb, 8, 2 * dp), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (8, TB), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (norb, 2 * dp, TB) if not _is_chain(model) else (1, 8, 128),
                jnp.float32,
            )
        ],
        compiler_params=pltpu.CompilerParams(
            # the default scoped-vmem cap (16M) double-counts the
            # grid-invariant W block (pipeline double buffering)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(SC, vals_t, W, vcat, E, PW)

    log_amp = out[0, :N]
    if model.phase_mode == "arg":
        phase = jnp.arctan2(out[2, :N], out[1, :N])
    else:
        phase = out[1, :N]
    from pynqs_tpu.ops import onv as onv_ops

    sgn = onv_ops.permute_sgn(
        bits_i[:, np.asarray(model._so_order)], jnp.asarray(model._sgnA)
    )
    phase = phase + params["global_phase"].astype(jnp.float32) + jnp.pi * (
        1.0 - sgn
    ) / 2.0
    return jnp.stack([log_amp, phase], axis=-1)
