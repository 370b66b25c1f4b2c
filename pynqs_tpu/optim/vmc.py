"""VMC optimization driver.

TPU re-design of the reference's VMCOptimizer loop
(vmc/optim/optimizer.py:135-243 / _base.py:42-437): one fully-jitted
train step (sample → local energy → gradient → optax update) driven by
a thin host loop that only logs and checkpoints.  Gradient clipping and
LR schedules are optax chains instead of hand-rolled logic.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from pynqs_tpu.energy.eloc import local_energy_simple
from pynqs_tpu.grad.energy_grad import energy_and_grad

__all__ = ["VMC", "VMCConfig"]


@dataclass
class VMCConfig:
    n_iter: int = 500
    lr: float = 1e-2
    eloc_batch: int | None = None  # chunk of samples per eloc slab
    clip_grad: float | None = 1.0  # global-norm clip; None = off
    optimizer: optax.GradientTransformation | None = None
    log_every: int = 25
    use_sr: bool = False  # stochastic reconfiguration preconditioning
    sr_damping: float = 1e-3
    checkpoint_path: str | None = None
    checkpoint_interval: int = 100
    log_path: str | None = None


class VMC:
    """Binds (model, system, sampler) into a jitted step + host loop.

    With ``mesh`` given, the sample/chain batch is sharded over the
    mesh's ``dp`` axis (params replicated); all cross-device reductions
    (⟨E⟩, gradient sums) are inserted by GSPMD — the TPU equivalent of
    the reference's DDP + rank-sharded eloc (SURVEY.md §2.2).
    """

    def __init__(
        self, model, system, sampler, config: VMCConfig | None = None, mesh=None
    ):
        self.model = model
        self.system = system
        self.sampler = sampler
        self.mesh = mesh
        self.cfg = config or VMCConfig()
        tx = self.cfg.optimizer
        if tx is None:
            tx = optax.adam(self.cfg.lr)
        if self.cfg.clip_grad is not None:
            tx = optax.chain(optax.clip_by_global_norm(self.cfg.clip_grad), tx)
        self.tx = tx
        self._ops = system.tables.astuple()
        self._table = system.excitation
        self.history: list[float] = []

        if mesh is not None:
            from pynqs_tpu.parallel.mesh import batch_sharding

            self._batch_sharding = batch_sharding(mesh)
        else:
            self._batch_sharding = None

        @jax.jit
        def step(params, opt_state, key, chain_state):
            k_s, _ = jax.random.split(key)
            bits, w, _lp, chain_state = self.sampler.sample(
                self.model, params, k_s, chain_state
            )
            if self._batch_sharding is not None:
                bits = jax.lax.with_sharding_constraint(
                    bits, self._batch_sharding
                )
            # MultiPsi: samples drawn from |φ|² need |f|² importance
            # reweighting (reference vmc/sample.py:1062-1115)
            if hasattr(self.model, "log_factor"):
                f2 = jnp.exp(
                    2.0 * self.model.log_factor(params, bits)[..., 0]
                )
                w = jax.lax.stop_gradient(w * jnp.where(w > 0, f2, 0.0))
                w = w / w.sum()
            eloc = local_energy_simple(
                partial(self.model.log_psi, params),
                bits,
                self._ops,
                self._table,
                batch=self.cfg.eloc_batch,
            )
            e, grads, var = energy_and_grad(self.model, params, bits, w, eloc)
            e_re = e[0]
            if self.cfg.use_sr:
                from pynqs_tpu.grad.sr import sr_gradient

                grads = sr_gradient(
                    self.model, params, bits, w, eloc,
                    damping=self.cfg.sr_damping,
                )
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, chain_state, e_re, var

        self._step = step

    def run(
        self,
        key: jax.Array,
        params=None,
        n_iter: int | None = None,
        callback: Callable[[int, float, float], None] | None = None,
    ):
        """Optimize; returns (params, energies list — total incl. ecore)."""
        n_iter = n_iter or self.cfg.n_iter
        k_init, key = jax.random.split(key)
        if params is None:
            params = self.model.init(k_init)
        opt_state = self.tx.init(params)
        chain_state = self.sampler.init_state(k_init)
        if chain_state is not None and self._batch_sharding is not None:
            chain_state = jax.device_put(chain_state, self._batch_sharding)
        ecore = self.system.ecore
        e_ref = self.system.e_ref

        from pynqs_tpu.utils.logging import RunLogger

        log = RunLogger(self.cfg.log_path)
        for it in range(n_iter):
            key, k = jax.random.split(key)
            t0 = time.perf_counter()
            params, opt_state, chain_state, e, var = self._step(
                params, opt_state, k, chain_state
            )
            e_tot = float(e) + ecore
            dt = time.perf_counter() - t0
            self.history.append(e_tot)
            if callback is not None:
                callback(it, e_tot, float(var))
            if (it % self.cfg.log_every == 0) or it == n_iter - 1:
                extra = (
                    f" Δref={1000 * (e_tot - e_ref):+.3f} mHa"
                    if e_ref is not None
                    else ""
                )
                log.info(
                    f"iter {it:5d}  E = {e_tot:.8f} Ha  σ² = {float(var):.3e}"
                    f"  t = {dt:.3f}s{extra}"
                )
                log.record(iter=it, energy=e_tot, var=float(var), iter_time=dt)
            if (
                self.cfg.checkpoint_path is not None
                and (it + 1) % self.cfg.checkpoint_interval == 0
            ):
                from pynqs_tpu.utils.checkpoint import save_checkpoint

                save_checkpoint(
                    self.cfg.checkpoint_path, it, params, opt_state,
                    self.history,
                )
        log.close()
        return params, self.history
