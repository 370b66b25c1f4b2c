"""Non-autoregressive correction / amplitude models + composites.

Reference: vmc/ansatz/rbm/rbm_other.py (IsingRBM :10, RIsingRBM :175,
DBM :304, Jastrow :443) and vmc/ansatz/hybrid/{hybrid,multi}.py.

These are plain log-ψ models (no AR sampling) used either standalone
with MCMC/exact sampling or as multiplicative corrections inside
:class:`MultiPsi`.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from pynqs_tpu.ops.onv import bits_to_spins

__all__ = [
    "Jastrow",
    "DBM",
    "IsingRBM",
    "HybridWavefunction",
    "MultiPsi",
    "SpinProjected",
]


def _pair0(logabs):
    """Positive real wavefunction -> (log|ψ|, 0) pair."""
    from pynqs_tpu.ops import cplx

    return cplx.make(logabs, jnp.zeros_like(logabs))


@dataclass(frozen=True)
class Jastrow:
    """log ψ = ½ xᵀ W x + a·x (pairwise Jastrow factor, rbm_other.py:443)."""

    sorb: int
    dtype: jnp.dtype = jnp.float64

    def init(self, key):
        k1, k2 = jax.random.split(key)
        W = 0.01 * jax.random.normal(k1, (self.sorb, self.sorb), self.dtype)
        return {"W": (W + W.T) / 2, "a": jnp.zeros((self.sorb,), self.dtype)}

    def log_psi(self, params, bits):
        x = bits_to_spins(bits, self.dtype)
        out = 0.5 * jnp.einsum("...p,pq,...q->...", x, params["W"], x)
        out = out + x @ params["a"]
        return _pair0(out)


@dataclass(frozen=True)
class IsingRBM:
    """RBM with spin-pair (Ising) visible couplings feeding the hidden
    layer (rbm_other.py:10 IsingRBM / :175 RIsingRBM — the real and
    complex-parameter variants): θ_j = Σ_pq W_j,pq x_p x_q + b_j."""

    sorb: int
    alpha: int = 1
    param_type: str = "real"  # "real" | "complex"
    dtype: jnp.dtype = jnp.float64

    @property
    def nh(self):
        return self.alpha * self.sorb

    def init(self, key):
        k = jax.random.split(key, 5)
        p = {
            "W": 0.01
            * jax.random.normal(
                k[0], (self.nh, self.sorb, self.sorb), self.dtype
            ),
            "b": jnp.zeros((self.nh,), self.dtype),
            "a": 0.01 * jax.random.normal(k[1], (self.sorb,), self.dtype),
        }
        if self.param_type == "complex":
            p["W_im"] = 0.01 * jax.random.normal(
                k[2], (self.nh, self.sorb, self.sorb), self.dtype
            )
            p["b_im"] = jnp.zeros((self.nh,), self.dtype)
            p["a_im"] = 0.01 * jax.random.normal(
                k[3], (self.sorb,), self.dtype
            )
        return p

    def log_psi(self, params, bits):
        from pynqs_tpu.ops import cplx

        x = bits_to_spins(bits, self.dtype)
        th_re = (
            jnp.einsum("...p,jpq,...q->...j", x, params["W"], x) + params["b"]
        )
        vis_re = x @ params["a"]
        if self.param_type == "complex":
            th_im = (
                jnp.einsum("...p,jpq,...q->...j", x, params["W_im"], x)
                + params["b_im"]
            )
            vis_im = x @ params["a_im"]
        else:
            th_im = jnp.zeros_like(th_re)
            vis_im = jnp.zeros_like(vis_re)
        la, ph = cplx.log2cosh_pair(th_re, th_im)
        return cplx.make(vis_re + la.sum(-1), vis_im + ph.sum(-1))


@dataclass(frozen=True)
class DBM:
    """Deep Boltzmann machine with the second hidden layer traced out
    analytically (rbm_other.py:304): two stacked cosh layers."""

    sorb: int
    nh1: int = 32
    nh2: int = 32
    dtype: jnp.dtype = jnp.float64

    def init(self, key):
        k = jax.random.split(key, 4)
        s1 = 1.0 / np.sqrt(self.sorb)
        s2 = 1.0 / np.sqrt(self.nh1)
        return {
            "W1": s1 * jax.random.normal(k[0], (self.sorb, self.nh1), self.dtype),
            "b1": jnp.zeros((self.nh1,), self.dtype),
            "W2": s2 * jax.random.normal(k[1], (self.nh1, self.nh2), self.dtype),
            "b2": jnp.zeros((self.nh2,), self.dtype),
            "a": 0.01 * jax.random.normal(k[2], (self.sorb,), self.dtype),
        }

    def log_psi(self, params, bits):
        x = bits_to_spins(bits, self.dtype)
        t1 = jnp.tanh(x @ params["W1"] + params["b1"])
        t2 = x @ params["a"] + jnp.log(
            2 * jnp.cosh(t1 @ params["W2"] + params["b2"])
        ).sum(-1)
        return _pair0(t2)


class HybridWavefunction:
    """ψ = |amp(x)| · e^{iφ(x)}: a real AR amplitude model combined with
    a separate phase network (reference hybrid/hybrid.py): AR sampling
    delegates to the amplitude model (phase does not affect |ψ|²)."""

    def __init__(self, amp_model, phase_model):
        self.amp = amp_model
        self.phase = phase_model
        self.sorb = amp_model.sorb
        self.noa = getattr(amp_model, "noa", None)
        self.nob = getattr(amp_model, "nob", None)
        self.sites_per_step = getattr(amp_model, "sites_per_step", None)
        self.site_order = getattr(amp_model, "site_order", None)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"amp": self.amp.init(k1), "phase": self.phase.init(k2)}

    def log_psi(self, params, bits):
        from pynqs_tpu.ops import cplx

        la = self.amp.log_psi(params["amp"], bits)
        lp = self.phase.log_psi(params["phase"], bits)
        # phase model's log-magnitude output is the phase angle φ(x)
        return cplx.make(la[..., 0], la[..., 1] + lp[..., 0])

    # AR contract delegates to the amplitude model
    def ar_init(self, params, capacity):
        return self.amp.ar_init(params["amp"], capacity)

    def ar_step(self, params, carry, k, prev):
        return self.amp.ar_step(params["amp"], carry, k, prev)


class MultiPsi:
    """ψ(n) = φ(n) · f(n): AR model φ times a multiplicative correction
    f (reference hybrid/multi.py + docs/methods/vmc.rst:61-103).
    Sampling draws from |φ|²; the VMC driver must re-weight local
    energies by f — or, simplest and exact, evaluate log ψ = log φ +
    log f in forward so eloc ratios already include f, while AR
    sampling (from φ only) makes the sampling distribution |φ|²: the
    importance-ratio correction ⟨f²⟩ is then handled by the weighted
    estimators (`extra_norm` below)."""

    def __init__(self, sample_model, factor_model):
        self.phi = sample_model
        self.f = factor_model
        self.sorb = sample_model.sorb
        self.noa = getattr(sample_model, "noa", None)
        self.nob = getattr(sample_model, "nob", None)
        self.sites_per_step = getattr(sample_model, "sites_per_step", None)
        self.site_order = getattr(sample_model, "site_order", None)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"phi": self.phi.init(k1), "f": self.f.init(k2)}

    def log_psi(self, params, bits):
        return self.phi.log_psi(params["phi"], bits) + self.f.log_psi(
            params["f"], bits
        )

    def log_factor(self, params, bits):
        return self.f.log_psi(params["f"], bits)

    def ar_init(self, params, capacity):
        return self.phi.ar_init(params["phi"], capacity)

    def ar_step(self, params, carry, k, prev):
        return self.phi.ar_step(params["phi"], carry, k, prev)


class SpinProjected:
    """Spin-flip symmetry projection P̂η = (1 + η Û_SF)/2 (reference
    vmc/energy/flip.py + docs/methods/vmc.rst:105-184):

        ψ_P(n) = [ψ(n) + η · s(n) · ψ(n̄)] / 2

    with n̄ the α↔β flipped determinant, s(n) the fermionic reordering
    sign of Û_SF, and η = (−1)^{N/2 − S} (reference _SpinProjection
    singleton, public_function.py:1017-1036).  AR sampling draws from
    the base |ψ|²; `log_factor` exposes ψ_P/ψ so the VMC driver's
    importance reweighting (⟨F²⟩, reference gather_flip
    vmc/sample.py:1117-1156) applies automatically.
    """

    def __init__(self, base, eta: int):
        from pynqs_tpu.ops import onv as _onv

        self.base = base
        self.eta = float(eta)
        self._onv = _onv
        self.sorb = base.sorb
        self.noa = getattr(base, "noa", None)
        self.nob = getattr(base, "nob", None)
        self.sites_per_step = getattr(base, "sites_per_step", None)
        self.site_order = getattr(base, "site_order", None)

    def init(self, key):
        return self.base.init(key)

    def log_psi(self, params, bits):
        lp = self.base.log_psi(params, bits)
        flipped = self._onv.spin_flip_bits(bits)
        lpf = self.base.log_psi(params, flipped)
        s = self._onv.spin_flip_sign(bits).astype(lp.dtype)
        from pynqs_tpu.ops import cplx

        lpf_signed = cplx.make(
            lpf[..., 0], lpf[..., 1] + jnp.pi * (1.0 - s) / 2.0
        )
        return cplx.add_exp(lp, lpf_signed, 0.5, 0.5 * self.eta)

    def log_factor(self, params, bits):
        """log(ψ_P/ψ) for sampling-measure reweighting."""
        return self.log_psi(params, bits) - self.base.log_psi(params, bits)

    def ar_init(self, params, capacity):
        return self.base.ar_init(params, capacity)

    def ar_step(self, params, carry, k, prev):
        return self.base.ar_step(params, carry, k, prev)
