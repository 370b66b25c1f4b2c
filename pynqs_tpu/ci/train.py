"""CI pre-training: fit an NQS ansatz to a CI wavefunction before VMC.

Reference: ci/train.py (CITrain) with its loss families
(`sqaure_loss` onstate overlap :310, `QGT_loss` sample-based local
overlap :323, `lsm`/`lsm-phase` least-squares :456+).  All three are
re-expressed as pure jitted losses over static determinant sets:

  * "overlap":  L = 1 − |⟨ψ_CI|ψ⟩_S|² / (⟨ψ|ψ⟩_S)   on the CI set S
    (ψ_CI normalized on S) — the deterministic onstate fit.
  * "sample":   L = 1 − |⟨o⟩_p|²/⟨|o|²⟩_p with o(n) = ψ_CI(n)/ψ(n),
    p = |ψ|² via the model's own AR sampling — the QGT/local-overlap
    fit usable when S is too big to enumerate.
  * "lsm":      least-squares  Σ_S |ψ(n) − c_n|²  with ψ taken at a
    learnable global phase (the reference's lsm-phase).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax

from pynqs_tpu.ci.wavefunction import CIWavefunction
from pynqs_tpu.ops import cplx

__all__ = ["CITrain", "CITrainConfig"]


@dataclass
class CITrainConfig:
    n_iter: int = 500
    lr: float = 1e-2
    loss: str = "overlap"  # "overlap" | "sample" | "lsm"
    n_sample: int = 1 << 12  # for loss == "sample"
    capacity: int = 1 << 10
    log_every: int = 50


class CITrain:
    def __init__(self, model, ci: CIWavefunction, config: CITrainConfig | None = None):
        self.model = model
        self.ci = ci
        self.cfg = config or CITrainConfig()
        self.tx = optax.adam(self.cfg.lr)
        self._bits = jnp.asarray(ci.bits)
        self._c = jnp.asarray(ci.coeffs, dtype=jnp.float64)  # real CI coeffs

        cfg = self.cfg

        if cfg.loss in ("overlap", "lsm"):

            @jax.jit
            def step(params, opt_state, key):
                def loss_fn(p):
                    lp = self.model.log_psi(p, self._bits)  # [m, 2]
                    re, im = cplx.exp_pair(lp)
                    den = (re**2 + im**2).sum()
                    if cfg.loss == "overlap":
                        num = (self._c @ re) ** 2 + (self._c @ im) ** 2
                        return 1.0 - num / den
                    # lsm: match amplitudes up to the learnable global
                    # phase already inside the model
                    scale = jnp.sqrt(den)
                    return (
                        (re / scale - self._c) ** 2 + (im / scale) ** 2
                    ).sum()

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, loss

        elif cfg.loss == "sample":
            from pynqs_tpu.ops import lut as lut_mod
            from pynqs_tpu.sampler.ar import ar_sampling

            logc = jnp.log(jnp.maximum(jnp.abs(self._c), 1e-30))
            phc = jnp.where(self._c < 0, jnp.pi, 0.0)
            ci_lut = lut_mod.WavefunctionLUT.build(
                self._bits, jnp.stack([logc, phc], -1)
            )

            @jax.jit
            def step(params, opt_state, key):
                bits, counts, _ = ar_sampling(
                    self.model, params, key, cfg.n_sample, capacity=cfg.capacity
                )
                w = counts.astype(jnp.float64)
                w = w / jnp.maximum(w.sum(), 1.0)
                vals, found = ci_lut.lookup(bits, fill=0.0)
                lp_ci = jnp.stack(
                    [jnp.where(found, vals[..., 0], -690.0), vals[..., 1]], -1
                )

                alive = (w > 0)[:, None]

                def loss_fn(p):
                    lp = self.model.log_psi(p, bits)  # [C, 2]
                    # mask INPUTS on dead rows so no inf/NaN ever enters
                    # the exp (masking outputs still NaNs the backward)
                    lp = jnp.where(alive, lp, 0.0)
                    lpc = jnp.where(alive, lp_ci, 0.0)
                    o_re, o_im = cplx.ratio_re_im(lpc, lp)
                    o_re = jnp.where(alive[:, 0], o_re, 0.0)
                    o_im = jnp.where(alive[:, 0], o_im, 0.0)
                    num = (w @ o_re) ** 2 + (w @ o_im) ** 2
                    den = (w * (o_re**2 + o_im**2)).sum()
                    return 1.0 - num / jnp.maximum(den, 1e-30)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, loss

        else:
            raise ValueError(f"unknown CITrain loss {cfg.loss!r}")

        self._step = step
        self.history: list[float] = []

    def run(self, key: jax.Array, params=None):
        if params is None:
            key, k = jax.random.split(key)
            params = self.model.init(k)
        opt_state = self.tx.init(params)
        for it in range(self.cfg.n_iter):
            key, k = jax.random.split(key)
            params, opt_state, loss = self._step(params, opt_state, k)
            self.history.append(float(loss))
        return params, self.history

    def overlap(self, params) -> float:
        """|⟨ψ_CI|ψ⟩| restricted to the CI set (diagnostic)."""
        lp = self.model.log_psi(params, self._bits)
        re, im = cplx.exp_pair(lp)
        num = jnp.sqrt((self._c @ re) ** 2 + (self._c @ im) ** 2)
        den = jnp.sqrt((re**2 + im**2).sum())
        return float(num / den)
