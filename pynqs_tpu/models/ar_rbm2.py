"""Autoregressive RBM with 2-site (4-way) cosh-product conditionals.

Re-design of the reference AR-RBM two-site mode (vmc/ansatz/rbm/
ar_rbm.py:307 `forward_two_sites` / :454 `ar_sampling_two_sites`): for
each spatial block t (spin orbitals 2t, 2t+1), the four candidate
configurations x ∈ {00, 10, 01, 11} are scored by the RBM free-energy
product

    val_x = Π_h 2 cosh( θ_t,h + s_a(x)·W[h, 2t] + s_b(x)·W[h, 2t+1] )

with θ_t = c + Σ_{sites < 2t} W·s the running hidden pre-activation,
then L2-normalized (the reference's F.normalize) so the conditional
probability is val_x² / Σ val².  log-domain throughout on TPU
(log 2cosh is the stable closed form); the phase comes from an MLP over
the full spin configuration, as in the 1-site ARRBM.

Sampling carries only θ [C, nh] — the masking of future sites is
implicit in the running sum, no per-site weight masks.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from pynqs_tpu.ops.onv import bits_to_spins
from pynqs_tpu.sampler.symmetry import apply_mask_logp, mask_two_site

__all__ = ["ARRBM2"]

# the 4 block values x = a + 2b as (s_a, s_b) spin pairs
_SA = np.array([-1.0, 1.0, -1.0, 1.0])
_SB = np.array([-1.0, -1.0, 1.0, 1.0])


def _log2cosh(x):
    a = jnp.abs(x)
    return a + jnp.log1p(jnp.exp(-2.0 * a))  # log(2cosh x) - log(1)=...


@dataclass(frozen=True)
class ARRBM2:
    sorb: int
    noa: int
    nob: int
    nh: int = 32
    phase_hidden: int = 32
    dtype: jnp.dtype = jnp.float64
    sites_per_step: int = 2

    @property
    def n_blocks(self) -> int:
        return self.sorb // 2

    def init(self, key):
        k = jax.random.split(key, 4)
        return {
            "W": 0.1 * jax.random.normal(k[0], (self.nh, self.sorb), self.dtype),
            "c": jnp.zeros((self.nh,), self.dtype),
            "ph_w1": 0.1
            * jax.random.normal(k[1], (self.sorb, self.phase_hidden), self.dtype),
            "ph_b1": jnp.zeros((self.phase_hidden,), self.dtype),
            "ph_w2": 0.1
            * jax.random.normal(k[2], (self.phase_hidden,), self.dtype),
            "global_phase": jnp.zeros((), self.dtype),
        }

    def _block_logval(self, params, theta, t: int):
        """log Π_h 2cosh(θ + s_a W_a + s_b W_b) for the 4 values.

        theta [C, nh] -> [C, 4]."""
        wa = params["W"][:, 2 * t]  # [nh]
        wb = params["W"][:, 2 * t + 1]
        sa = jnp.asarray(_SA, self.dtype)
        sb = jnp.asarray(_SB, self.dtype)
        cand = (
            theta[:, None, :]
            + sa[None, :, None] * wa[None, None, :]
            + sb[None, :, None] * wb[None, None, :]
        )  # [C, 4, nh]
        return _log2cosh(cand).sum(-1)

    # ---------------- AR contract ----------------

    def ar_init(self, params, capacity):
        return jnp.broadcast_to(params["c"], (capacity, self.nh))

    def ar_step(self, params, carry, k: int, prev):
        theta = carry
        if k > 0:
            a = (prev & 1).astype(self.dtype) * 2.0 - 1.0
            b = ((prev >> 1) & 1).astype(self.dtype) * 2.0 - 1.0
            theta = (
                theta
                + a[:, None] * params["W"][:, 2 * (k - 1)][None]
                + b[:, None] * params["W"][:, 2 * (k - 1) + 1][None]
            )
        lv = self._block_logval(params, theta, k)  # [C, 4]
        logp = 2.0 * lv  # P ∝ val²  (L2-normalized conditional)
        return logp - jax.scipy.special.logsumexp(logp, -1, keepdims=True), theta

    # ---------------- forward ----------------

    def log_psi(self, params, bits):
        bits = bits.astype(jnp.int32)
        squeeze = bits.ndim == 1
        if squeeze:
            bits = bits[None]
        B = bits.shape[0]
        nb = self.n_blocks
        x = bits_to_spins(bits, self.dtype)  # ±1 [B, sorb]
        contrib = x[:, None, :] * params["W"][None, :, :]  # [B, nh, sorb]
        cum = jnp.cumsum(contrib, axis=-1)
        # θ before block t = c + sum of the first 2t site contributions
        zeros = jnp.zeros((B, self.nh, 1), self.dtype)
        cum_excl = jnp.concatenate([zeros, cum], axis=-1)  # [B, nh, sorb+1]
        vals = (bits[:, 0::2] + 2 * bits[:, 1::2]).astype(jnp.int32)  # [B, nb]

        cum_a = jnp.cumsum(bits[:, 0::2], -1)
        cum_b = jnp.cumsum(bits[:, 1::2], -1)
        z1 = jnp.zeros((B, 1), cum_a.dtype)
        used_a = jnp.concatenate([z1, cum_a[:, :-1]], 1)
        used_b = jnp.concatenate([z1, cum_b[:, :-1]], 1)

        log_amp = jnp.zeros((B,), self.dtype)
        for t in range(nb):
            theta_t = cum_excl[:, :, 2 * t] + params["c"][None]
            lv = self._block_logval(params, theta_t, t)
            rem = nb - t - 1
            mask = mask_two_site(
                used_a[:, t], used_b[:, t], self.noa, self.nob, rem, rem
            )
            logp = apply_mask_logp(2.0 * lv, mask)
            oh = jax.nn.one_hot(vals[:, t], 4, dtype=logp.dtype)
            log_amp = log_amp + 0.5 * (oh * logp).sum(-1)

        phase = (
            jnp.tanh(x @ params["ph_w1"] + params["ph_b1"]) @ params["ph_w2"]
            + params["global_phase"]
        )
        from pynqs_tpu.ops import cplx

        out = cplx.make(log_amp, phase)
        return out[0] if squeeze else out
