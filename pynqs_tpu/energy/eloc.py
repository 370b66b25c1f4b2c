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
from pynqs_tpu.ops.excitation import ExcitationTable
from pynqs_tpu.ops.hamiltonian import comb_hij

__all__ = [
    "local_energy_simple",
    "local_energy_reduce",
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
) -> jax.Array:
    """Semi-stochastic screened E_loc (reference ElocMethod.REDUCE,
    vmc/energy/eloc.py:205-323), re-shaped for static-shape XLA:

    Instead of a data-dependent ε threshold (`gt_eps_idx`), the k_det
    largest |H_nm| terms per sample are summed exactly (lax.top_k) and
    the remaining tail is estimated unbiasedly with n_stoch multinomial
    draws ∝ |H_nm|:   Σ_tail H r  ≈  (S/n) Σ_s sign(H_s) r_s · S_norm,
    S = Σ_tail |H|.  NN forwards per sample drop from 1+n_sd to
    1 + k_det + n_stoch.
    """
    h1e, h2e, diag1, K, J = tables

    def chunk_eloc(args):
        chunk_bits, k = args
        comb, hij = comb_hij(
            chunk_bits, h1e, h2e, diag1, K, J, hpair, table=table, with_comb=True
        )
        b, m, sorb = comb.shape
        n_off = m - 1
        kd = min(k_det, n_off)
        hij_off = hij[:, 1:]
        absh = jnp.abs(hij_off)

        # deterministic top-k by |H|
        top_abs, top_idx = jax.lax.top_k(absh, kd)  # [b, kd]
        det_bits = jnp.take_along_axis(
            comb[:, 1:, :], top_idx[:, :, None], axis=1
        )  # [b, kd, sorb]
        det_h = jnp.take_along_axis(hij_off, top_idx, axis=1)

        # stochastic tail ∝ residual |H|
        resid = absh.at[
            jnp.arange(b)[:, None], top_idx
        ].set(0.0)
        s_tail = resid.sum(-1)  # [b]
        logits = jnp.log(jnp.maximum(resid, 1e-30))
        draw = jax.random.categorical(
            k, logits[:, None, :], axis=-1, shape=(b, n_stoch)
        )  # [b, n_stoch]
        st_bits = jnp.take_along_axis(
            comb[:, 1:, :], draw[:, :, None], axis=1
        )
        st_h = jnp.take_along_axis(hij_off, draw, axis=1)

        # one fused forward over [self | det | stoch]
        all_bits = jnp.concatenate(
            [chunk_bits[:, None, :], det_bits, st_bits], axis=1
        )
        lp = log_psi_fn(all_bits.reshape(b * (1 + kd + n_stoch), sorb)).reshape(
            b, 1 + kd + n_stoch, 2
        )
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
