"""Autoregressive GRU wavefunction.

Re-design of the reference RNNWavefunction (vmc/ansatz/rnn/rnn.py):
a GRU over the sorb spin-orbital sites (1-site conditionals), amplitude
from per-site masked softmax conditionals, phase from an MLP over the
full spin configuration.  The (N, Sz) symmetry mask is applied inside
`log_psi` with exactly the same closed form the AR sampler uses, so
sampling frequencies match |ψ|² exactly.

TPU notes: the teacher-forced forward is one `lax.scan` over sites with
the whole batch as an MXU-shaped [B, H] state; exact AR sampling uses
the generic fixed-capacity driver (pynqs_tpu.sampler.ar) with the GRU
hidden state as the gathered carry.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from pynqs_tpu.ops.onv import bits_to_spins
from pynqs_tpu.sampler.symmetry import apply_mask_logp, mask_one_site

__all__ = ["RNNWavefunction"]


def _dense_init(key, n_in, n_out, dtype, scale=None):
    if scale is None:
        scale = 1.0 / jnp.sqrt(n_in)
    kw, kb = jax.random.split(key)
    return {
        "w": scale * jax.random.normal(kw, (n_in, n_out), dtype=dtype),
        "b": jnp.zeros((n_out,), dtype=dtype),
    }


def _dense(p, x):
    return x @ p["w"] + p["b"]


def _gru_init(key, n_in, n_h, dtype):
    k = jax.random.split(key, 3)
    return {
        "z": _dense_init(k[0], n_in + n_h, n_h, dtype),
        "r": _dense_init(k[1], n_in + n_h, n_h, dtype),
        "h": _dense_init(k[2], n_in + n_h, n_h, dtype),
    }


def _gru(p, x, h):
    xh = jnp.concatenate([x, h], axis=-1)
    z = jax.nn.sigmoid(_dense(p["z"], xh))
    r = jax.nn.sigmoid(_dense(p["r"], xh))
    hc = jnp.tanh(_dense(p["h"], jnp.concatenate([x, r * h], axis=-1)))
    return (1 - z) * h + z * hc


@dataclass(frozen=True)
class RNNWavefunction:
    sorb: int
    noa: int
    nob: int
    hidden: int = 64
    phase_hidden: int = 64
    dtype: jnp.dtype = jnp.float64
    sites_per_step: int = 1  # AR driver contract

    def init(self, key: jax.Array):
        k = jax.random.split(key, 4)
        return {
            "gru": _gru_init(k[0], 2, self.hidden, self.dtype),
            "amp": _dense_init(k[1], self.hidden, 2, self.dtype),
            "ph1": _dense_init(k[2], self.sorb, self.phase_hidden, self.dtype),
            "ph2": _dense_init(k[3], self.phase_hidden, 1, self.dtype),
        }

    # ---------------- AR-sampling contract ----------------

    def ar_init(self, params, capacity: int):
        h0 = jnp.zeros((capacity, self.hidden), dtype=self.dtype)
        return h0

    def ar_step(self, params, carry, k: int, prev: jax.Array):
        h = carry
        if k == 0:
            x = jnp.zeros((h.shape[0], 2), dtype=self.dtype)
        else:
            x = jax.nn.one_hot(prev, 2, dtype=self.dtype)
        h = _gru(params["gru"], x, h)
        logp = jax.nn.log_softmax(_dense(params["amp"], h), axis=-1)
        return logp, h

    # ---------------- forward ----------------

    def _cond_logp(self, params, bits: jax.Array) -> jax.Array:
        """Masked, normalized conditional log-probs [B, sorb, 2]."""
        B = bits.shape[0]
        x_seq = jax.nn.one_hot(bits, 2, dtype=self.dtype)  # [B, sorb, 2]
        # input at site k is the value of site k-1 (start token = zeros)
        inp = jnp.concatenate(
            [jnp.zeros((B, 1, 2), self.dtype), x_seq[:, :-1, :]], axis=1
        )
        h0 = jnp.zeros((B, self.hidden), dtype=self.dtype)

        def step(h, xk):
            h = _gru(params["gru"], xk, h)
            return h, jax.nn.log_softmax(_dense(params["amp"], h), axis=-1)

        _, logits = jax.lax.scan(step, h0, jnp.swapaxes(inp, 0, 1))
        logp = jnp.swapaxes(logits, 0, 1)  # [B, sorb, 2]

        # symmetry mask, identical to the sampler's
        cum_a = jnp.cumsum(bits[:, 0::2], axis=-1)
        cum_b = jnp.cumsum(bits[:, 1::2], axis=-1)
        used_a = jnp.repeat(
            jnp.concatenate([jnp.zeros((B, 1), cum_a.dtype), cum_a[:, :-1]], 1),
            2,
            axis=-1,
        )[:, : self.sorb]
        used_b = jnp.repeat(
            jnp.concatenate([jnp.zeros((B, 1), cum_b.dtype), cum_b[:, :-1]], 1),
            2,
            axis=-1,
        )[:, : self.sorb]
        masked = []
        for k in range(self.sorb):
            rem = self.sorb // 2 - k // 2 - 1
            if k % 2 == 0:
                m = mask_one_site(used_a[:, k], self.noa, rem)
            else:
                m = mask_one_site(used_b[:, k], self.nob, rem)
            masked.append(apply_mask_logp(logp[:, k], m))
        return jnp.stack(masked, axis=1)

    def log_psi(self, params, bits: jax.Array) -> jax.Array:
        bits = bits.astype(jnp.int32)
        squeeze = bits.ndim == 1
        if squeeze:
            bits = bits[None]
        logp = self._cond_logp(params, bits)
        oh = jax.nn.one_hot(bits, 2, dtype=logp.dtype)  # [B, sorb, 2]
        picked = (logp * oh).sum(-1)  # one-hot select (VPU, not gather)
        log_amp = 0.5 * picked.sum(-1)
        spins = bits_to_spins(bits, self.dtype)
        phase = _dense(
            params["ph2"], jnp.tanh(_dense(params["ph1"], spins))
        )[..., 0]
        from pynqs_tpu.ops import cplx

        out = cplx.make(log_amp, phase)
        return out[0] if squeeze else out
