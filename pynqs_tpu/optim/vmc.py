"""VMC optimization driver.

TPU re-design of the reference's VMCOptimizer loop
(vmc/optim/optimizer.py:135-243 / _base.py:42-437): one fully-jitted
train step (sample → local energy → gradient → optax update) driven by
a thin host loop that only logs and checkpoints.  Gradient clipping and
LR schedules are optax chains instead of hand-rolled logic.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import Callable

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
    eloc_method: str = "simple"  # "simple" | "reduce"
    eloc_k_det: int = 256  # REDUCE: deterministic top-k terms
    eloc_n_stoch: int = 64  # REDUCE: stochastic tail draws
    # REDUCE deterministic-set selection: "exact" (lax.top_k row sort),
    # "segmax" (sort-free strided segment winners — measured -12 ms on
    # the flagship step, unbiased by construction), "approx"
    eloc_topk: str = "exact"
    # AD microbatch rows (reference MAX_AD_DIM): backward-pass
    # activations scale with this, not the sample-buffer size
    grad_batch: int | None = None
    # REDUCE eloc forward dedup (reference use_unique): evaluate ψ once
    # per unique connected determinant per eloc chunk.  Static unique
    # capacity — size with energy/eloc.reduce_unique_count first.
    eloc_dedup_max: int | None = None
    # prefix-sharing eloc forward (ops/fused_rnn_prefix): reuse each
    # sample's recurrence prefix for its screened/tail children.
    # Chain GraphMPSRNN + TPU only; exclusive with eloc_dedup_max.
    eloc_prefix: bool = False
    clip_grad: float | None = 1.0  # global-norm clip; None = off
    optimizer: optax.GradientTransformation | None = None
    log_every: int = 25
    use_sr: bool = False  # stochastic reconfiguration preconditioning
    sr_damping: float = 1e-3
    # "dense" [P,P] | "cg" matrix-free min-SR | "blocked" per-tensor
    # block-diagonal (the K-FAC-family preconditioner, grad/sr.py)
    sr_solver: str = "dense"
    sr_n_cg: int = 50
    checkpoint_path: str | None = None
    checkpoint_interval: int = 100
    log_path: str | None = None
    # adaptive sample-count ramp (reference sampler_param
    # start_n_sample/start_iter, vmc/sample.py:571-625,980-992): run
    # with start_n_sample until ramp_iter, then switch to the sampler's
    # full n_sample (one extra compile at the switch).
    start_n_sample: int | None = None
    ramp_iter: int = 0
    # 3-sigma adaptive gradient-norm clipping (reference _clip_grad_L2,
    # vmc/optim/_base.py:357-382): after ``clip_window`` iterations the
    # effective max-norm is min(clip_grad, mean + 3*std of the last
    # ``clip_window`` gradient norms).
    adaptive_clip_3sigma: bool = False
    clip_window: int = 100
    # staged clip schedule (reference clip_grad_scheduler,
    # example/Fe2S2/Fe2S2-OO-dcut-20.py:146-152: 0.1 -> 0.01 -> 0.001
    # x max_grad_norm): callable iteration -> max-norm, overriding
    # ``clip_grad``.  Host-side — the threshold is a dynamic step input
    # so changing it never recompiles.
    clip_schedule: object = None
    # warn in the log when the sampler drops more than this fraction of
    # the sampled mass (capacity truncation biases the energy — the
    # round-2 "+10.35 mHa" was a truncated-measure artifact)
    dropped_warn: float = 0.005
    # DMRG-style freeze-and-sweep (reference FrozeSites,
    # mps_rnn.py:158): callable iteration -> gradient-mask pytree
    # (see optim/sweep.site_freeze_mask); None = all trainable.
    param_mask_fn: object = None
    # capture a jax.profiler trace of iterations [2, 2+profile_iters)
    # into profile_dir (reference: torch.profiler scopes + per-phase
    # wall-time logs, SURVEY.md §5 tracing)
    profile_dir: str | None = None
    profile_iters: int = 3
    # use the Pallas fused teacher-forced forward (ops/fused_rnn) for
    # the gradient-free eloc ratio evaluations when the model supports
    # it.  None = auto: on for TPU backends, off on CPU (where the
    # kernel would run interpreted).  The [B] sampled rows that need
    # gradients always keep the XLA forward.
    fused_forward: bool | None = None
    fused_matmul_dtype: str = "bf16"  # "bf16" | "f32"
    # Polyak / exponential moving average of the parameters.  At a
    # finite learning-rate floor the iterates jitter around the basin
    # (the Fe2S2 flagship moves ±50 mHa iter-to-iter at lr 5e-4);
    # since E[θ] is variational the averaged point is typically lower
    # in energy than the mean energy of the iterates.  The EMA tree is
    # kept on device, saved in checkpoints under "ema", and exposed as
    # ``vmc.ema_params`` after run().
    ema_decay: float | None = None  # e.g. 0.999


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
        # clipping applied manually in the step (the threshold is a
        # dynamic input so the 3-sigma adaptation needs no recompile)
        self.tx = tx
        self._ops = system.tables.astuple()
        self._hpair = system.tables.hpair_best
        self._table = system.excitation
        self.history: list[float] = []

        if mesh is not None:
            from pynqs_tpu.parallel.mesh import batch_sharding

            self._batch_sharding = batch_sharding(mesh)
        else:
            self._batch_sharding = None

        self._step = self._build_step(self.sampler)

    def _eloc_forward(self, params):
        """log ψ closure for the (gradient-free) eloc ratio forwards."""
        use = self.cfg.fused_forward
        if use is None:
            use = jax.default_backend() not in ("cpu",)
        if use:
            from pynqs_tpu.ops.fused_rnn import (
                fused_forward_available,
                graph_mpsrnn_logpsi_fused,
            )

            if fused_forward_available(self.model):
                import jax.numpy as _jnp

                dt = (
                    _jnp.float32
                    if self.cfg.fused_matmul_dtype == "f32"
                    else _jnp.bfloat16
                )
                return partial(
                    graph_mpsrnn_logpsi_fused,
                    self.model,
                    params,
                    matmul_dtype=dt,
                    interpret=jax.default_backend() == "cpu",
                )
        return partial(self.model.log_psi, params)

    def _eloc_prefix_fwd(self, params):
        """ReducePrefixForward for the REDUCE eloc (cfg.eloc_prefix)."""
        if not self.cfg.eloc_prefix:
            return None
        from pynqs_tpu.ops.fused_rnn_prefix import (
            ReducePrefixForward,
            prefix_available,
        )

        if not prefix_available(self.model):
            return None
        import jax.numpy as _jnp

        dt = (
            _jnp.float32
            if self.cfg.fused_matmul_dtype == "f32"
            else _jnp.bfloat16
        )
        return ReducePrefixForward(
            self.model, params, matmul_dtype=dt,
            interpret=jax.default_backend() == "cpu",
        )

    def _build_step(self, sampler):
        @jax.jit
        def step(params, opt_state, key, chain_state, clip_val, gmask):
            k_s, _ = jax.random.split(key)
            bits, w, _lp, chain_state = sampler.sample(
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
            if self.cfg.eloc_method == "reduce":
                from pynqs_tpu.energy.eloc import local_energy_reduce

                _, k_e = jax.random.split(key)
                eloc = local_energy_reduce(
                    self._eloc_forward(params),
                    bits,
                    self._ops,
                    self._table,
                    k_e,
                    k_det=self.cfg.eloc_k_det,
                    n_stoch=self.cfg.eloc_n_stoch,
                    batch=self.cfg.eloc_batch,
                    hpair=self._hpair,
                    topk=self.cfg.eloc_topk,
                    dedup_unique_max=self.cfg.eloc_dedup_max,
                    prefix_fwd=self._eloc_prefix_fwd(params),
                )
            else:
                eloc = local_energy_simple(
                    self._eloc_forward(params),
                    bits,
                    self._ops,
                    self._table,
                    batch=self.cfg.eloc_batch,
                    hpair=self._hpair,
                )
            e, grads, var = energy_and_grad(
                self.model, params, bits, w, eloc,
                grad_batch=self.cfg.grad_batch,
            )
            e_re = e[0]
            # effective sample size (probability weights): diagnostics
            n_eff = 1.0 / jnp.maximum((w**2).sum(), 1e-30)
            if self.cfg.use_sr:
                if self.cfg.sr_solver == "cg":
                    from pynqs_tpu.grad.sr import sr_gradient_cg

                    grads = sr_gradient_cg(
                        self.model, params, bits, w, eloc,
                        damping=self.cfg.sr_damping, n_cg=self.cfg.sr_n_cg,
                        jac_batch=self.cfg.grad_batch,
                    )
                elif self.cfg.sr_solver == "blocked":
                    from pynqs_tpu.grad.sr import sr_gradient_blocked

                    grads = sr_gradient_blocked(
                        self.model, params, bits, w, eloc,
                        damping=self.cfg.sr_damping,
                    )
                else:
                    from pynqs_tpu.grad.sr import sr_gradient

                    grads = sr_gradient(
                        self.model, params, bits, w, eloc,
                        damping=self.cfg.sr_damping,
                    )
            if self.cfg.param_mask_fn is not None:
                grads = jax.tree.map(lambda g, m: g * m, grads, gmask)
            gnorm = optax.global_norm(grads)
            if self.cfg.clip_grad is not None or self.cfg.clip_schedule is not None:
                scale = jnp.minimum(1.0, clip_val / jnp.maximum(gnorm, 1e-30))
                grads = jax.tree.map(lambda g: g * scale, grads)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            # liveness diagnostic: a NaN-poisoned model produces zero
            # sample counts, which reads as E = 0.0 (not NaN) — surface
            # it as an explicit flag for the host loop
            w_sum = jax.lax.stop_gradient(w.sum())
            # sampling-truncation diagnostics (ARSampler reports them in
            # its state slot; -1 = sampler doesn't measure dropped mass)
            if isinstance(chain_state, dict) and "dropped_frac" in chain_state:
                dropped = chain_state["dropped_frac"]
                n_unique = chain_state["n_unique"]
            else:
                dropped = jnp.float32(-1.0)
                n_unique = (w > 0).sum().astype(jnp.float32)
            return (params, opt_state, chain_state, e_re, var, w_sum,
                    n_eff, gnorm, dropped, n_unique)

        return step

    def operator_expected(self, params, operator_tables, key, sampler=None):
        """⟨O⟩ ± se for an operator given as (dense h1e, compressed h2e)
        — e.g. utils spin_raising for ⟨S⁻S⁺⟩ (reference
        vmc/optim/optimizer.py:245-297 swaps h1e/h2e into eloc).
        """
        import numpy as np

        from pynqs_tpu.ops.integrals import precompute_hij_tables
        from pynqs_tpu.utils.stats import operator_stats

        h1e_o, h2e_o = operator_tables
        t = precompute_hij_tables(
            np.asarray(h1e_o), np.asarray(h2e_o), self.system.sorb,
            self.system.dtype,
        )
        ops = tuple(jnp.asarray(x) for x in (t.h1e, t.h2e, t.diag1, t.K, t.J))
        hp = None if t.Hpair is None else jnp.asarray(t.Hpair)
        sampler = sampler or self.sampler
        chain = sampler.init_state(key)
        bits, w, _lp, _ = sampler.sample(self.model, params, key, chain)
        if self.cfg.eloc_method == "reduce":
            # REDUCE-mode operator expectation (reference recomputes
            # operators in sample space under REDUCE, vmc/energy/
            # etot.py:119-140): screened top-k + stochastic tail with
            # the OPERATOR's matrix elements — avoids the full 1+n_sd
            # forwards the SIMPLE path pays.
            from pynqs_tpu.energy.eloc import local_energy_reduce

            oloc = local_energy_reduce(
                self._eloc_forward(params), bits, ops, self._table,
                jax.random.fold_in(key, 77),
                k_det=self.cfg.eloc_k_det, n_stoch=self.cfg.eloc_n_stoch,
                batch=self.cfg.eloc_batch, hpair=hp,
                topk=self.cfg.eloc_topk,
                prefix_fwd=self._eloc_prefix_fwd(params),
            )
        else:
            oloc = local_energy_simple(
                self._eloc_forward(params), bits, ops, self._table,
                batch=self.cfg.eloc_batch, hpair=hp,
            )
        return operator_stats(oloc[:, 0], w)

    def noise_tune(self, params, key, scale=0.1):
        """NoisyTune parameter perturbation (reference
        vmc/optim/optimizer.py:299-322): add uniform noise scaled by
        each tensor's std."""

        leaves, treedef = jax.tree.flatten(params)
        keys = jax.random.split(key, len(leaves))
        out = [
            l
            + (jax.random.uniform(k, l.shape, l.dtype) - 0.5)
            * jnp.std(l)
            * scale
            for l, k in zip(leaves, keys)
        ]
        return jax.tree.unflatten(treedef, out)

    def run(
        self,
        key: jax.Array,
        params=None,
        n_iter: int | None = None,
        callback: Callable[[int, float, float], None] | None = None,
        resume_from: str | None = None,
    ):
        """Optimize; returns (params, energies list — total incl. ecore).

        ``resume_from``: checkpoint path — restores params, optimizer
        state and energy history and continues (reference
        read_checkpoint, _base.py:289-308)."""
        n_iter = n_iter or self.cfg.n_iter
        self._gnorms: list[float] = []
        k_init, key = jax.random.split(key)
        if resume_from is not None:
            from pynqs_tpu.utils.checkpoint import load_checkpoint

            ck = load_checkpoint(resume_from)
            template = params if params is not None else self.model.init(k_init)
            params = jax.tree.map(
                lambda t, r: jnp.asarray(r, t.dtype), template, ck["params"]
            )
            # orbax restores NamedTuple optax states as plain lists —
            # rebuild against the template treedef by leaf order
            template = self.tx.init(params)
            leaves_t, treedef = jax.tree.flatten(template)
            leaves_r = jax.tree.leaves(ck["opt_state"])
            if len(leaves_t) != len(leaves_r):
                raise ValueError(
                    "checkpoint optimizer state does not match the "
                    f"configured optimizer ({len(leaves_r)} vs "
                    f"{len(leaves_t)} leaves)"
                )
            opt_state = jax.tree.unflatten(
                treedef,
                [
                    jnp.asarray(r, getattr(t, "dtype", None))
                    if hasattr(t, "dtype")
                    else r
                    for t, r in zip(leaves_t, leaves_r)
                ],
            )
            self.history = list(ck["history"])
        else:
            if params is None:
                params = self.model.init(k_init)
            opt_state = self.tx.init(params)
        self.ema_params = None
        ema_step = None
        if self.cfg.ema_decay is not None:
            d = float(self.cfg.ema_decay)
            ema_step = jax.jit(
                lambda e, p: jax.tree.map(
                    lambda a, b: d * a + (1.0 - d) * b.astype(a.dtype), e, p
                )
            )
            if resume_from is not None and ck.get("ema") is not None:
                self.ema_params = jax.tree.map(
                    lambda t, r: jnp.asarray(r, t.dtype), params, ck["ema"]
                )
            else:
                self.ema_params = jax.tree.map(jnp.asarray, params)
        chain_state = self.sampler.init_state(k_init)
        # MCMC thermalization: extra burn-in sweeps once, before the
        # optimization loop (reference therm_step, vmc/sample.py:446)
        therm = int(getattr(self.sampler, "therm", 0) or 0)
        if chain_state is not None and therm > 0:
            key, k_th = jax.random.split(key)
            chain_state = self.sampler.run(
                self.model, params, k_th, chain_state, therm
            )[0]
        if chain_state is not None and self._batch_sharding is not None:
            # batch-shard chain arrays; scalar leaves (e.g. the
            # ARSampler truncation diagnostics) replicate — a rank-0
            # value cannot take a 'dp'-partitioned spec
            from jax.sharding import NamedSharding, PartitionSpec

            repl = NamedSharding(self._batch_sharding.mesh, PartitionSpec())
            chain_state = jax.tree.map(
                lambda x: jax.device_put(
                    x,
                    self._batch_sharding if jnp.ndim(x) >= 1 else repl,
                ),
                chain_state,
            )
        ecore = self.system.ecore
        e_ref = self.system.e_ref

        from pynqs_tpu.utils.logging import RunLogger

        log = RunLogger(self.cfg.log_path)

        # sample-count ramp: smaller n_sample for the warm-up phase
        step_fn = self._step
        ramp_fn = None
        if (
            self.cfg.start_n_sample is not None
            and self.cfg.ramp_iter > 0
            and hasattr(self.sampler, "n_sample")
        ):
            import dataclasses

            small = dataclasses.replace(
                self.sampler, n_sample=self.cfg.start_n_sample
            )
            ramp_fn = self._build_step(small)

        for it in range(n_iter):
            use = ramp_fn if (ramp_fn is not None and it < self.cfg.ramp_iter) else step_fn
            key, k = jax.random.split(key)
            t0 = time.perf_counter()
            if self.cfg.profile_dir is not None and it == 2:
                jax.profiler.start_trace(self.cfg.profile_dir)
            clip_val = self.cfg.clip_grad if self.cfg.clip_grad is not None else 0.0
            if self.cfg.clip_schedule is not None:
                clip_val = float(self.cfg.clip_schedule(it))
            if (
                self.cfg.adaptive_clip_3sigma
                and len(self._gnorms) >= self.cfg.clip_window
            ):
                import numpy as _np

                recent = _np.asarray(self._gnorms[-self.cfg.clip_window :])
                clip_val = min(clip_val, float(recent.mean() + 3 * recent.std()))
            gmask = (
                self.cfg.param_mask_fn(it)
                if self.cfg.param_mask_fn is not None
                else jax.tree.map(lambda _: jnp.ones(()), params)
            )
            (params, opt_state, chain_state, e, var, w_sum, n_eff, gnorm,
             dropped, n_unique) = use(
                params, opt_state, k, chain_state,
                jnp.asarray(clip_val, jnp.float32), gmask,
            )
            if ema_step is not None:
                self.ema_params = ema_step(self.ema_params, params)
            self._gnorms.append(float(gnorm))
            if (
                self.cfg.profile_dir is not None
                and it == 2 + self.cfg.profile_iters - 1
            ):
                jax.block_until_ready(e)
                jax.profiler.stop_trace()
            e_tot = float(e) + ecore
            dt = time.perf_counter() - t0
            if (not (e_tot == e_tot)) or float(w_sum) <= 0.0:
                # NaN guard (reference etot.py:150) + dead-sampler guard
                # (NaN params produce zero counts, which reads as E=0)
                log.info(
                    f"iter {it}: energy NaN or dead sampler "
                    f"(w_sum={float(w_sum)}) — aborting run"
                )
                log.close()
                raise FloatingPointError(
                    f"NaN/dead-sampler at iteration {it}; last good: "
                    f"{self.history[-1] if self.history else None}"
                )
            self.history.append(e_tot)
            if callback is not None:
                callback(it, e_tot, float(var))
            if (it % self.cfg.log_every == 0) or it == n_iter - 1:
                extra = (
                    f" Δref={1000 * (e_tot - e_ref):+.3f} mHa"
                    if e_ref is not None
                    else ""
                )
                se = (float(var) / max(float(n_eff), 1.0)) ** 0.5
                drop_f = float(dropped)
                drop_s = f" drop={100 * drop_f:.3f}%" if drop_f >= 0 else ""
                log.info(
                    f"iter {it:5d}  E = {e_tot:.8f} ± {se:.2e} Ha  "
                    f"σ² = {float(var):.3e}  t = {dt:.3f}s{extra}{drop_s}"
                )
                log.record(
                    iter=it, energy=e_tot, var=float(var), se=se,
                    n_eff=float(n_eff), iter_time=dt,
                    dropped_frac=drop_f, n_unique=float(n_unique),
                )
                if drop_f > self.cfg.dropped_warn:
                    # round-2/3 lesson: a truncated sampling measure
                    # silently biases the energy estimate
                    log.info(
                        f"iter {it:5d}  WARNING: {100 * drop_f:.2f}% of the "
                        f"sampled mass was dropped (capacity truncation) — "
                        f"energies are biased; raise capacity/n_group"
                    )
            if (
                self.cfg.checkpoint_path is not None
                and (it + 1) % self.cfg.checkpoint_interval == 0
            ):
                from pynqs_tpu.utils.checkpoint import save_checkpoint

                save_checkpoint(
                    self.cfg.checkpoint_path, it, params, opt_state,
                    self.history,
                    extra=(
                        {"ema": self.ema_params}
                        if self.ema_params is not None
                        else None
                    ),
                )
        log.close()
        return params, self.history
