"""Autoregressive RBM (NADE-style 1-site conditionals).

Re-design of the reference AR-RBM (vmc/ansatz/rbm/ar_rbm.py: per-site
masked weight matrices + cosh products).  Equivalent conditional
structure, TPU-friendly incremental form: the hidden pre-activation is
a running sum updated in O(nh) per site,

    θ_k = c + Σ_{j<k} W[:, j] x_j          (x = ±1 spins)
    p(x_k | x_<k) = softmax( U_k tanh(θ_k) + d_k )   over x_k ∈ {0, 1}

so AR sampling carries just θ [C, nh] (no per-site weight masking
needed — masking is implicit in the running sum).  Phase from an MLP
over the full configuration, as in the hybrid amplitude/phase split.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from pynqs_tpu.ops.onv import bits_to_spins
from pynqs_tpu.sampler.symmetry import apply_mask_logp, mask_one_site

__all__ = ["ARRBM"]


@dataclass(frozen=True)
class ARRBM:
    sorb: int
    noa: int
    nob: int
    nh: int = 32
    phase_hidden: int = 32
    dtype: jnp.dtype = jnp.float64
    sites_per_step: int = 1

    def init(self, key):
        k = jax.random.split(key, 5)
        s = 1.0 / np.sqrt(self.nh)
        return {
            "W": 0.1 * jax.random.normal(k[0], (self.nh, self.sorb), self.dtype),
            "c": jnp.zeros((self.nh,), self.dtype),
            "U": s * jax.random.normal(k[1], (self.sorb, 2, self.nh), self.dtype),
            "d": jnp.zeros((self.sorb, 2), self.dtype),
            "ph_w1": 0.1
            * jax.random.normal(k[2], (self.sorb, self.phase_hidden), self.dtype),
            "ph_b1": jnp.zeros((self.phase_hidden,), self.dtype),
            "ph_w2": 0.1
            * jax.random.normal(k[3], (self.phase_hidden,), self.dtype),
        }

    # ---------------- AR contract ----------------

    def ar_init(self, params, capacity):
        theta = jnp.broadcast_to(params["c"], (capacity, self.nh))
        return theta

    def ar_step(self, params, carry, k: int, prev):
        theta = carry
        if k > 0:
            x_prev = 2.0 * prev.astype(self.dtype) - 1.0
            theta = theta + x_prev[:, None] * params["W"][:, k - 1][None, :]
        logits = jnp.tanh(theta) @ params["U"][k].T + params["d"][k]
        return jax.nn.log_softmax(logits, axis=-1), theta

    # ---------------- forward ----------------

    def log_psi(self, params, bits):
        bits = bits.astype(jnp.int32)
        squeeze = bits.ndim == 1
        if squeeze:
            bits = bits[None]
        B = bits.shape[0]
        x = bits_to_spins(bits, self.dtype)  # [B, sorb]
        # θ before each site: exclusive cumulative sum of W columns
        contrib = x[:, None, :] * params["W"][None, :, :]  # [B, nh, sorb]
        theta_cum = jnp.cumsum(contrib, axis=-1)
        theta_excl = (
            jnp.concatenate(
                [jnp.zeros((B, self.nh, 1), self.dtype), theta_cum[..., :-1]],
                axis=-1,
            )
            + params["c"][None, :, None]
        )  # [B, nh, sorb]
        hidden = jnp.tanh(theta_excl)  # [B, nh, sorb]
        logits = (
            jnp.einsum("bhk,kvh->bkv", hidden, params["U"]) + params["d"][None]
        )  # [B, sorb, 2]
        logp = jax.nn.log_softmax(logits, axis=-1)

        cum_a = jnp.cumsum(bits[:, 0::2], -1)
        cum_b = jnp.cumsum(bits[:, 1::2], -1)
        zeros = jnp.zeros((B, 1), cum_a.dtype)
        exc_a = jnp.concatenate([zeros, cum_a[:, :-1]], 1)
        exc_b = jnp.concatenate([zeros, cum_b[:, :-1]], 1)
        masked = []
        for k in range(self.sorb):
            rem = self.sorb // 2 - k // 2 - 1
            if k % 2 == 0:
                m = mask_one_site(exc_a[:, k // 2], self.noa, rem)
            else:
                m = mask_one_site(exc_b[:, k // 2], self.nob, rem)
            masked.append(apply_mask_logp(logp[:, k], m))
        logp = jnp.stack(masked, axis=1)
        oh = jax.nn.one_hot(bits, 2, dtype=logp.dtype)
        picked = (logp * oh).sum(-1)  # one-hot select (VPU, not gather)
        log_amp = 0.5 * picked.sum(-1)
        phase = jnp.tanh(x @ params["ph_w1"] + params["ph_b1"]) @ params["ph_w2"]
        from pynqs_tpu.ops import cplx

        out = cplx.make(log_amp, phase)
        return out[0] if squeeze else out
