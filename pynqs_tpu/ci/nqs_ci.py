"""Hybrid CI-NQS wavefunction optimization.

Reference: ci_vmc/hybrid.py (NqsCi): ψ = Σ_i c_i|d_i⟩ + c_m|φ̂⟩ with
φ̂ the NQS restricted to the orthogonal complement of the CI set D,
per-iteration dense eigensolve of the (m+1)×(m+1) effective H
(make_ci_hij :188, make_ci_nqs :280, make_nqs_nqs :334, solve_eigh
:351), and NQS gradients coupled through the eigen-coefficients
(new_nqs_grad :458).

TPU re-design — exploiting exact AR normalization (Σ|φ|² = 1):
  * ⟨φ'|φ'⟩ = 1 − Σ_{d∈D} |φ(d)|²  is CLOSED FORM (φ' = φ off D),
    so the complement normalization needs no Monte Carlo.
  * H_cn[i] = ⟨d_i|H|φ̂⟩ = Σ_{k ∈ SD(d_i)\\D} H_ik φ(k) / ‖φ'‖ is a
    deterministic, AD-differentiable sum over the static connected
    space of each CI determinant (the reference estimates this from
    samples + LUT; here it is exact).
  * H_nn = ⟨φ̂|H|φ̂⟩ is the only MC piece: a standard VMC local-energy
    mean under the D-masked wavefunction.
  * θ-gradient: Hellmann–Feynman ∂λ = c†(∂H)c at the eigenvector —
    surrogate = |c_m|²·(VMC covariance surrogate for H_nn)
              + 2 Re[c_m Σ_i c_i · H_cn_i(θ)]  (plain AD term).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax

from pynqs_tpu.energy.eloc import local_energy_simple
from pynqs_tpu.ops import lut as lut_mod
from pynqs_tpu.ops import onv as onv_ops
from pynqs_tpu.ops.hamiltonian import comb_hij, hij_dense

__all__ = ["NqsCi", "NqsCiConfig"]


@dataclass
class NqsCiConfig:
    n_iter: int = 300
    lr: float = 5e-3
    n_sample: int = 1 << 13
    capacity: int = 1 << 10
    log_every: int = 50


class NqsCi:
    def __init__(self, model, system, ci_bits: np.ndarray, config=None):
        self.model = model
        self.system = system
        self.cfg = config or NqsCiConfig()
        self.tx = optax.adam(self.cfg.lr)
        ops = system.tables.astuple()
        hpair = system.tables.hpair
        table = system.excitation
        self._ops = ops
        self._table = table

        d_bits = jnp.asarray(ci_bits, dtype=jnp.int8)
        m = d_bits.shape[0]
        self.m = m
        # D-membership LUT (values unused)
        d_packed = onv_ops.pack_bits(d_bits)
        d_sorted, _ = lut_mod.sort_onv(d_packed, jnp.zeros((m,)))
        self._d_sorted = d_sorted
        self._d_bits = d_bits

        # static: dense CI block + CI connected spaces
        self._h_cc = jnp.real(hij_dense(d_bits, d_bits, *ops))  # [m, m]
        comb, hij_ci = comb_hij(
            d_bits, *ops, hpair, table=table, with_comb=True
        )  # [m, 1+nsd, sorb], [m, 1+nsd]
        flat = comb.reshape(-1, comb.shape[-1])
        _, in_d = lut_mod.lut_search(d_sorted, onv_ops.pack_bits(flat))
        in_d = in_d.reshape(comb.shape[:2])
        self._ci_comb = comb
        # zero out connections landing back inside D (those live in H_cc)
        self._ci_hij = jnp.where(in_d, 0.0, hij_ci)

        cfg = self.cfg
        from pynqs_tpu.sampler.ar import ar_sampling

        def masked_log_psi(params, bits):
            """log φ'(n) pair: φ off D, ~0 on D."""
            lp = self.model.log_psi(params, bits)  # [N, 2]
            _, member = lut_mod.lut_search(
                self._d_sorted, onv_ops.pack_bits(bits)
            )
            la = jnp.where(member, lp[..., 0] - 690.0, lp[..., 0])
            return jnp.stack([la, lp[..., 1]], -1)

        @jax.jit
        def step(params, opt_state, key):
            # ---- sample from φ, discard D members by weight-zeroing.
            # NOTE: ar_sampling's exclude_sorted_keys is NOT used here:
            # per-step exclusion renormalizes conditionals prefix by
            # prefix, which is a DIFFERENT measure than the global
            # restriction |φ'|²/‖φ'‖² that the estimators below assume
            # (using it biased H_nn badly).  Weight-zeroing keeps the
            # estimator exactly importance-consistent. ----
            bits, counts, _ = ar_sampling(
                self.model, params, key, cfg.n_sample, capacity=cfg.capacity
            )
            _, member = lut_mod.lut_search(
                self._d_sorted, onv_ops.pack_bits(bits)
            )
            w = jnp.where(member, 0, counts).astype(jnp.float64)
            w = w / jnp.maximum(w.sum(), 1.0)

            # ---- deterministic pieces (functions of θ) ----
            def h_cn_fn(p):
                from pynqs_tpu.ops import cplx

                lp_d = self.model.log_psi(p, self._d_bits)  # [m, 2]
                flat_ci = self._ci_comb.reshape(-1, self._ci_comb.shape[-1])
                lp_c = self.model.log_psi(p, flat_ci).reshape(
                    self._ci_comb.shape[:2] + (2,)
                )
                phi_re, phi_im = cplx.exp_pair(lp_c)
                norm2 = 1.0 - jnp.exp(2 * lp_d[..., 0]).sum()
                norm = jnp.sqrt(jnp.maximum(norm2, 1e-30))
                h_re = (self._ci_hij * phi_re).sum(-1) / norm  # [m]
                h_im = (self._ci_hij * phi_im).sum(-1) / norm
                return h_re, h_im

            # ---- MC piece: H_nn ----
            eloc = local_energy_simple(
                partial(masked_log_psi, params), bits, ops, table, hpair=hpair
            )  # [C, 2]
            alive = w > 0
            eloc = jnp.where(alive[:, None], eloc, 0.0)
            h_nn = (w * eloc[:, 0]).sum()

            h_cn_re, _ = h_cn_fn(params)
            # ---- assemble + eigensolve (real-symmetrized) ----
            heff = jnp.zeros((self.m + 1, self.m + 1), jnp.float64)
            heff = heff.at[: self.m, : self.m].set(self._h_cc)
            heff = heff.at[: self.m, self.m].set(h_cn_re)
            heff = heff.at[self.m, : self.m].set(h_cn_re)
            heff = heff.at[self.m, self.m].set(h_nn)
            evals, evecs = jnp.linalg.eigh(heff)
            c = jax.lax.stop_gradient(evecs[:, 0])
            e_tot = evals[0]

            # ---- Hellmann–Feynman surrogate ----
            cm = c[self.m]

            def surrogate(p):
                lp = masked_log_psi(p, bits)  # [C, 2]
                lp = jnp.where(alive[:, None], lp, 0.0)
                cen = jnp.where(
                    alive[:, None],
                    eloc - jnp.stack([h_nn, jnp.zeros_like(h_nn)]),
                    0.0,
                )
                s_nn = 2.0 * (w * (cen * lp).sum(-1)).sum()
                h_re_p, _ = h_cn_fn(p)
                s_cn = 2.0 * (c[: self.m] @ h_re_p) * cm
                return cm**2 * s_nn + s_cn

            grads = jax.grad(surrogate)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, e_tot, c

        self._step = step
        self.history: list[float] = []

    def run(self, key, params=None, n_iter=None):
        cfg = self.cfg
        n_iter = n_iter or cfg.n_iter
        if params is None:
            key, k = jax.random.split(key)
            params = self.model.init(k)
        opt_state = self.tx.init(params)
        ecore = self.system.ecore
        c = None
        for it in range(n_iter):
            key, k = jax.random.split(key)
            params, opt_state, e, c = self._step(params, opt_state, k)
            self.history.append(float(e) + ecore)
        return params, np.asarray(c), self.history
