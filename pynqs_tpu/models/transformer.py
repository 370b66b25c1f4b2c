"""GPT-style decoder wavefunction (2-site, 4-way conditionals).

Re-design of the reference DecoderWaveFunction + nanoGPT core
(vmc/ansatz/transformer/decoder.py, transformer/nanogpt/model.py):
a causal transformer over sorb/2 two-site blocks; vocabulary
{00, 10, 01, 11} plus a start token; amplitude from masked softmax
conditionals (the reference's "softmax-log" norm method,
decoder.py:174-191), phase from an MLP over the full spin
configuration plus a learnable global phase
(vmc/ansatz/utils.py:240-257).

TPU design: teacher-forced forward is one batched causal-attention
pass (MXU matmuls, static block_size); AR sampling uses the generic
fixed-capacity driver with a **preallocated KV cache** [C, L, h, dh]
carried through the site loop and row-gathered on branching — the
reference's dynamic cache concat + slice (decoder.py:299-345) becomes
a static `dynamic_update_slice` at step k.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from pynqs_tpu.ops.onv import bits_to_spins
from pynqs_tpu.sampler.symmetry import apply_mask_logp, mask_two_site

__all__ = ["DecoderWavefunction"]


def _dense_init(key, n_in, n_out, dtype, scale=None):
    if scale is None:
        scale = 1.0 / np.sqrt(n_in)
    return {
        "w": scale * jax.random.normal(key, (n_in, n_out), dtype=dtype),
        "b": jnp.zeros((n_out,), dtype=dtype),
    }


def _dense(p, x):
    return x @ p["w"] + p["b"]


def _ln(p, x, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def _ln_init(d, dtype):
    return {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}


@dataclass(frozen=True)
class DecoderWavefunction:
    sorb: int
    noa: int
    nob: int
    n_layer: int = 2
    n_head: int = 4
    d_model: int = 64
    phase_hidden: int = 64
    dtype: jnp.dtype = jnp.float64
    sites_per_step: int = 2
    # amplitude parametrization from the per-block head logits x
    # (reference NORM_METHOD, decoder.py:41 + vmc/ansatz/utils.py:194-238):
    #   "softmax-log":  P = softmax(x);            ψ_cond = sqrt(P)
    #   "norm":         a = x/‖x‖₂ (signed);       P = a², ψ_cond = a
    #   "norm-abs":     a = |x|/‖|x|‖₂;            P = a², ψ_cond = a
    #   "softmax-sign": P = softmax(x);            ψ_cond = sign(x)·sqrt(P)
    # Sampling always draws from P with the symmetry mask renormalized
    # per step (masking commutes with both softmax and L2
    # normalization), so sampled counts match |ψ|² for every method —
    # the reference's softmax-sign draws counts ∝ softmax² instead
    # (decoder.py:405), an inconsistency we do not reproduce.
    norm_method: str = "softmax-log"
    # lax.scan over positions in the AR driver (compile O(1) in sorb,
    # same scheme as GraphMPSRNN.scan_sites — see sampler/ar.
    # _ar_steps_scan).  The decoder step is position-independent apart
    # from wpe[k] / the cache write position, so the scan needs no
    # parameter stacking at all.
    scan_sites: bool = True

    @property
    def scan_ok(self) -> bool:
        return self.scan_sites

    @property
    def n_blocks(self) -> int:
        return self.sorb // 2

    @property
    def d_head(self) -> int:
        return self.d_model // self.n_head

    def init(self, key: jax.Array):
        d = self.d_model
        keys = iter(jax.random.split(key, 8 + 6 * self.n_layer))
        p = {
            # 5 input symbols: start token + 4 block values
            "wte": 0.02 * jax.random.normal(next(keys), (5, d), self.dtype),
            "wpe": 0.02
            * jax.random.normal(next(keys), (self.n_blocks, d), self.dtype),
            "blocks": [],
            "lnf": _ln_init(d, self.dtype),
            "head": _dense_init(next(keys), d, 4, self.dtype, scale=0.02),
            "ph1": _dense_init(next(keys), self.sorb, self.phase_hidden, self.dtype),
            "ph2": _dense_init(next(keys), self.phase_hidden, 1, self.dtype),
            "global_phase": jnp.zeros((), self.dtype),
        }
        blocks = []
        for _ in range(self.n_layer):
            blocks.append(
                {
                    "ln1": _ln_init(d, self.dtype),
                    "qkv": _dense_init(next(keys), d, 3 * d, self.dtype),
                    "proj": _dense_init(next(keys), d, d, self.dtype),
                    "ln2": _ln_init(d, self.dtype),
                    "fc": _dense_init(next(keys), d, 4 * d, self.dtype),
                    "fc2": _dense_init(next(keys), 4 * d, d, self.dtype),
                }
            )
        p["blocks"] = blocks
        return p

    # ---------------- full (teacher-forced) forward ----------------

    def _logits_full(self, params, tokens: jax.Array) -> jax.Array:
        """tokens [B, L] in 0..4 (first is start=4). Returns [B, L, 4]."""
        return _dense(params["head"], self._hidden_full(params, tokens))

    def _hidden_full(self, params, tokens: jax.Array) -> jax.Array:
        """Final-layernorm hidden states [B, L, d_model] (teacher-forced)."""
        B, L = tokens.shape
        # one-hot embedding select (per-row gathers are scalar-bound)
        toh = jax.nn.one_hot(tokens, 5, dtype=params["wte"].dtype)
        h = toh @ params["wte"] + params["wpe"][None, :L]
        causal = jnp.tril(jnp.ones((L, L), bool))
        for blk in params["blocks"]:
            x = _ln(blk["ln1"], h)
            qkv = _dense(blk["qkv"], x)
            q, k, v = jnp.split(qkv, 3, axis=-1)

            def heads(t):
                return t.reshape(B, L, self.n_head, self.d_head).swapaxes(1, 2)

            q, k, v = heads(q), heads(k), heads(v)
            att = (q @ k.swapaxes(-1, -2)) / np.sqrt(self.d_head)
            att = jnp.where(causal[None, None], att, -1e30)
            att = jax.nn.softmax(att, axis=-1)
            y = (att @ v).swapaxes(1, 2).reshape(B, L, self.d_model)
            h = h + _dense(blk["proj"], y)
            x = _ln(blk["ln2"], h)
            h = h + _dense(blk["fc2"], jax.nn.gelu(_dense(blk["fc"], x)))
        return _ln(params["lnf"], h)

    def _raw_cond_logp(self, logits: jax.Array):
        """(log P over the 4 block values, sign phase 0/π) per method —
        BEFORE symmetry masking (masking + renormalization commute with
        both softmax and L2 normalization, so the generic AR driver's
        apply_mask_logp finishes the job)."""
        if self.norm_method in ("softmax-log", "softmax-sign"):
            logp = jax.nn.log_softmax(logits, axis=-1)
            if self.norm_method == "softmax-sign":
                ph = jnp.where(logits > 0, 0.0, jnp.pi)
            else:
                ph = jnp.zeros_like(logits)
            return logp, ph
        if self.norm_method in ("norm", "norm-abs"):
            y = jnp.abs(logits) if self.norm_method == "norm-abs" else logits
            logp = 2.0 * jnp.log(jnp.maximum(jnp.abs(y), 1e-30))
            if self.norm_method == "norm":
                ph = jnp.where(y < 0, jnp.pi, 0.0)
            else:
                ph = jnp.zeros_like(logits)
            return logp, ph
        raise ValueError(f"unknown norm_method {self.norm_method!r}")

    def _cond_logp(self, params, bits: jax.Array):
        """Masked normalized conditional log-probs [B, n_blocks, 4]
        plus the per-value sign phase (0/π) for the signed methods."""
        B = bits.shape[0]
        nb = self.n_blocks
        vals = (bits[:, 0::2] + 2 * bits[:, 1::2]).astype(jnp.int32)  # [B, nb]
        tokens = jnp.concatenate(
            [jnp.full((B, 1), 4, jnp.int32), vals[:, :-1]], axis=1
        )
        logits = self._logits_full(params, tokens)
        logp, ph = self._raw_cond_logp(logits)

        cum_a = jnp.cumsum(bits[:, 0::2], -1)
        cum_b = jnp.cumsum(bits[:, 1::2], -1)
        zeros = jnp.zeros((B, 1), cum_a.dtype)
        used_a = jnp.concatenate([zeros, cum_a[:, :-1]], 1)
        used_b = jnp.concatenate([zeros, cum_b[:, :-1]], 1)
        rem = jnp.asarray(nb - 1 - np.arange(nb))
        mask = mask_two_site(
            used_a, used_b, self.noa, self.nob, rem[None, :], rem[None, :]
        )  # [B, nb, 4] via broadcast of per-step remaining
        return apply_mask_logp(logp, mask), ph

    def log_psi(self, params, bits: jax.Array) -> jax.Array:
        bits = bits.astype(jnp.int32)
        squeeze = bits.ndim == 1
        if squeeze:
            bits = bits[None]
        logp, ph_sign = self._cond_logp(params, bits)
        vals = (bits[:, 0::2] + 2 * bits[:, 1::2]).astype(jnp.int32)
        voh = jax.nn.one_hot(vals, 4, dtype=logp.dtype)
        picked = (logp * voh).sum(-1)  # one-hot select
        log_amp = 0.5 * picked.sum(-1)
        spins = bits_to_spins(bits, self.dtype)
        phase = (
            _dense(params["ph2"], jnp.tanh(_dense(params["ph1"], spins)))[..., 0]
            + params["global_phase"]
            + (ph_sign * voh).sum(-1).sum(-1)  # signed-amplitude methods
        )
        from pynqs_tpu.ops import cplx

        out = cplx.make(log_amp, phase)
        return out[0] if squeeze else out

    # ---------------- AR-sampling contract ----------------

    def ar_init(self, params, capacity: int):
        shape = (
            capacity,
            self.n_layer,
            self.n_blocks,
            self.n_head,
            self.d_head,
        )
        return {
            "k": jnp.zeros(shape, self.dtype),
            "v": jnp.zeros(shape, self.dtype),
        }

    def ar_step(self, params, carry, k: int, prev: jax.Array):
        h, carry = self._hidden_step(params, carry, k, prev)
        logp, _ph = self._raw_cond_logp(_dense(params["head"], h))
        return logp, carry

    def ar_scan_xs(self, params, k_from: int, k_to: int):
        """Scan inputs for the generic AR scan driver: the decoder
        step needs only the position index (``s`` = identity visiting
        order; parameters are position-independent)."""
        ks = jnp.arange(k_from, k_to, dtype=jnp.int32)
        return {"k": ks, "s": ks}

    def ar_step_scan(self, params, xs, carry, prev: jax.Array):
        """`ar_step` with a traced position index."""
        return self.ar_step(params, carry, xs["k"], prev)

    def _hidden_step(self, params, carry, k, prev: jax.Array):
        """One cached decoding step: hidden [C, d_model] + updated cache.

        ``k`` may be a python int (unrolled path) or a traced int32
        scalar (scan path) — jnp indexing and `.at[].set` lower the
        traced case to dynamic slices."""
        C = prev.shape[0]
        if isinstance(k, (int, np.integer)):
            tok = jnp.full((C,), 4, jnp.int32) if k == 0 else prev
        else:
            tok = jnp.where(jnp.equal(k, 0), jnp.int32(4), prev)
        toh = jax.nn.one_hot(tok, 5, dtype=params["wte"].dtype)
        h = toh @ params["wte"] + params["wpe"][k]  # [C, d]
        pos_mask = (jnp.arange(self.n_blocks) <= k)[None, None, :]  # [1,1,L]
        for li, blk in enumerate(params["blocks"]):
            x = _ln(blk["ln1"], h)
            qkv = _dense(blk["qkv"], x)
            q, kk, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(C, self.n_head, self.d_head)
            kk = kk.reshape(C, self.n_head, self.d_head)
            v = v.reshape(C, self.n_head, self.d_head)
            carry["k"] = carry["k"].at[:, li, k].set(kk)
            carry["v"] = carry["v"].at[:, li, k].set(v)
            ck = carry["k"][:, li]  # [C, L, h, dh]
            cv = carry["v"][:, li]
            att = jnp.einsum("chd,clhd->chl", q, ck) / np.sqrt(self.d_head)
            att = jnp.where(pos_mask, att, -1e30)
            att = jax.nn.softmax(att, axis=-1)
            y = jnp.einsum("chl,clhd->chd", att, cv).reshape(C, self.d_model)
            h = h + _dense(blk["proj"], y)
            x = _ln(blk["ln2"], h)
            h = h + _dense(blk["fc2"], jax.nn.gelu(_dense(blk["fc"], x)))
        h = _ln(params["lnf"], h)
        return h, carry
