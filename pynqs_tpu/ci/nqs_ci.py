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
    # Reference grad strategies (ci_vmc/hybrid.py:60-66,495-527).  In
    # the Hellmann–Feynman form both 0 and 1 produce the SAME gradient
    # c†(∂H)c = |c_m|²·∂H_nn + 2 c_m Σ_i c_i ∂H_cn,i; they differ only
    # in the warm-up floor applied while |c_m| ≈ 0 (the NQS weight of a
    # fresh model is tiny, so the raw gradient stalls): 0 rescales the
    # loss by max(|c_m|², cnqs_pow_min)/|c_m|² (quadratic floor), 1 by
    # max(|c_m|, √cnqs_pow_min)/|c_m| (linear floor).  2 drops the CI
    # coupling entirely (pure NQS covariance gradient — kept for parity;
    # the reference marks it "fail": it optimizes ⟨φ|H|φ⟩ instead of the
    # hybrid eigenvalue, so the CI mixing never feeds back into θ).
    grad_strategy: int = 1
    cnqs_pow_min: float = 1e-4
    # apply the floor only while iteration < start_iter (reference
    # start_iter; -1 = never floor)
    start_iter: int = -1
    # production-scale memory control (round 5): chunk the H_cn forward
    # over CI rows (each row's connected block is [1+n_sd] forwards)
    # and the H_nn local energy over sampled rows.  None = whole batch
    # (toy scale).
    ci_chunk: int | None = None
    eloc_batch: int | None = None


class NqsCi:
    def __init__(self, model, system, ci_bits: np.ndarray, config=None,
                 optimizer=None, eval_fwd=None):
        """``eval_fwd(params, bits) -> [N, 2]``: optional fast forward
        for the GRADIENT-FREE evaluations (the H_nn local energy's
        [C, 1+n_sd] connected block — the dominant per-iteration cost
        at production scale).  The coupled gradient's own forwards
        (sampled-row log ψ, H_cn) stay on ``model.log_psi`` because
        they need d log ψ / dθ; the Pallas fused kernel defines no
        VJP.  Default: ``model.log_psi`` (exact toy behavior)."""
        self.model = model
        self.system = system
        self.cfg = config or NqsCiConfig()
        self._eval_fwd = eval_fwd
        self.tx = optimizer if optimizer is not None else optax.adam(
            self.cfg.lr
        )
        ops = system.tables.astuple()
        hpair = system.tables.hpair_best
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

        def _masked(base_fwd, params, bits):
            """log φ'(n) pair: φ off D, ~0 on D."""
            lp = base_fwd(params, bits)  # [N, 2]
            _, member = lut_mod.lut_search(
                self._d_sorted, onv_ops.pack_bits(bits)
            )
            la = jnp.where(member, lp[..., 0] - 690.0, lp[..., 0])
            return jnp.stack([la, lp[..., 1]], -1)

        masked_log_psi = partial(_masked, self.model.log_psi)
        masked_eval = partial(
            _masked, self._eval_fwd or self.model.log_psi
        )

        if self.cfg.grad_strategy not in (0, 1, 2):
            raise ValueError("grad_strategy must be 0, 1 or 2")

        # ---- deterministic pieces (functions of θ).  base_fwd:
        # model.log_psi for the AD copy inside the surrogate; the fast
        # eval forward for the no-grad heff assembly ----
        def h_cn_fn(p, base_fwd=self.model.log_psi):
            from pynqs_tpu.ops import cplx

            lp_d = base_fwd(p, self._d_bits)  # [m, 2]
            flat_ci = self._ci_comb.reshape(-1, self._ci_comb.shape[-1])
            if cfg.ci_chunk:
                n = flat_ci.shape[0]
                blk = cfg.ci_chunk
                nb = -(-n // blk)
                padded = jnp.concatenate(
                    [flat_ci,
                     jnp.broadcast_to(flat_ci[:1],
                                      (nb * blk - n, flat_ci.shape[1]))]
                ).reshape(nb, blk, flat_ci.shape[1])
                lp_flat = jax.lax.map(
                    lambda r: base_fwd(p, r), padded
                ).reshape(nb * blk, 2)[:n]
            else:
                lp_flat = base_fwd(p, flat_ci)
            lp_c = lp_flat.reshape(self._ci_comb.shape[:2] + (2,))
            phi_re, phi_im = cplx.exp_pair(lp_c)
            norm2 = 1.0 - jnp.exp(2 * lp_d[..., 0]).sum()
            norm = jnp.sqrt(jnp.maximum(norm2, 1e-30))
            h_re = (self._ci_hij * phi_re).sum(-1) / norm  # [m]
            h_im = (self._ci_hij * phi_im).sum(-1) / norm
            return h_re, h_im

        # The per-iteration work is FOUR separate jitted programs with
        # the eigensolve on the host between them, NOT one fused step:
        # a single XLA module containing the AR sampler scan + the
        # AD-of-chunked-forward + the eigh QR loop hits a pathological
        # cross-program optimization blow-up (>40 min compile at the
        # flagship shape where the pieces compile in ~30-150 s each —
        # round-5 probe, logs/r5_compile_probe.log).  Host round-trips
        # cost microseconds per iteration; the eigensolve also gains
        # f64 (device x64 is unavailable on this TPU backend).

        @jax.jit
        def draw(params, key):
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
            return bits, w

        @jax.jit
        def eloc_eval(params, bits, w):
            # ---- MC piece: H_nn (gradient-free — fast eval forward) ----
            eloc = local_energy_simple(
                partial(masked_eval, params), bits, ops, table,
                hpair=hpair, batch=cfg.eloc_batch,
            )  # [C, 2]
            alive = w > 0
            eloc = jnp.where(alive[:, None], eloc, 0.0)
            h_nn = (w * eloc[:, 0]).sum()
            return eloc, h_nn

        @jax.jit
        def hcn_eval(params):
            h_re, _ = h_cn_fn(
                params, base_fwd=self._eval_fwd or self.model.log_psi
            )
            return h_re

        strat = self.cfg.grad_strategy

        @jax.jit
        def grad_step(params, opt_state, bits, w, eloc, h_nn, c, scale):
            alive = w > 0

            def surrogate(p):
                lp = masked_log_psi(p, bits)  # [C, 2]
                lp = jnp.where(alive[:, None], lp, 0.0)
                cen = jnp.where(
                    alive[:, None],
                    eloc - jnp.stack([h_nn, jnp.zeros_like(h_nn)]),
                    0.0,
                )
                s_nn = 2.0 * (w * (cen * lp).sum(-1)).sum()
                if strat == 2:
                    return s_nn
                cm = c[self.m]
                h_re_p, _ = h_cn_fn(p)
                s_cn = 2.0 * (c[: self.m] @ h_re_p) * cm
                return scale * (cm**2 * s_nn + s_cn)

            grads = jax.grad(surrogate)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state

        self._draw = draw
        self._eloc_eval = eloc_eval
        self._hcn_eval = hcn_eval
        self._grad_step = grad_step
        self.history: list[float] = []

    def run(self, key, params=None, n_iter=None):
        cfg = self.cfg
        n_iter = n_iter or cfg.n_iter
        if params is None:
            key, k = jax.random.split(key)
            params = self.model.init(k)
        opt_state = self.tx.init(params)
        ecore = self.system.ecore
        h_cc = np.asarray(self._h_cc, np.float64)
        m = self.m
        strat = cfg.grad_strategy
        pmin = cfg.cnqs_pow_min
        c = None
        for it in range(n_iter):
            key, k = jax.random.split(key)
            bits, w = self._draw(params, k)
            eloc, h_nn = self._eloc_eval(params, bits, w)
            h_cn_re = self._hcn_eval(params)
            # ---- assemble + eigensolve on the host (f64) ----
            heff = np.zeros((m + 1, m + 1))
            heff[:m, :m] = h_cc
            heff[:m, m] = np.asarray(h_cn_re, np.float64)
            heff[m, :m] = heff[:m, m]
            heff[m, m] = float(h_nn)
            evals, evecs = np.linalg.eigh(heff)
            c = evecs[:, 0]
            e_tot = float(evals[0])
            # ---- warm-up floor (reference grad strategies 0/1) ----
            floor_on = it < cfg.start_iter
            cm2 = max(c[m] ** 2, 1e-300)
            if strat == 0 and floor_on:
                scale = max(cm2, pmin) / cm2
            elif strat == 1 and floor_on:
                a = np.sqrt(cm2)
                scale = max(a, np.sqrt(pmin)) / a
            else:
                scale = 1.0
            params, opt_state = self._grad_step(
                params, opt_state, bits, w, eloc,
                jnp.asarray(float(h_nn)), jnp.asarray(c),
                jnp.asarray(float(scale)),
            )
            self.history.append(e_tot + ecore)
            if cfg.log_every and (it % cfg.log_every == 0 or
                                  it == n_iter - 1):
                print(
                    f"[nqsci] iter {it:5d}  e_tot = {e_tot + ecore:.6f} Ha"
                    f"  |c_m| = {abs(c[m]):.4f}", flush=True,
                )
        return params, np.asarray(c), self.history


def ci_polish(
    model,
    params,
    system,
    d_bits,
    sample_bits,
    key,
    *,
    fwd=None,
    sample_counts=None,
    ci_chunk: int = 128,
    eloc_batch: int = 1024,
    k_det: int = 1024,
    n_stoch: int = 256,
    restrict: str = "complement",
):
    """One-shot CI-NQS energy polish at production scale.

    Builds the (m+1)x(m+1) effective Hamiltonian of the hybrid state
    ψ = Σ_i c_i|d_i⟩ + c_m|φ̂⟩ (reference ci_vmc/hybrid.py NqsCi
    make_ci_hij/make_ci_nqs/make_nqs_nqs/solve_eigh :188-351) ONCE for
    fixed NQS parameters and returns its lowest eigenvalue.  Because
    the family contains ψ itself (c_i = φ(d_i), c_m = ‖φ'‖), the
    result is variationally ≤ the plain VMC energy of φ.

    TPU shape: every H_cn coupling is the exact closed-form sum over
    the static connected space of d_i (exact AR normalization gives
    the complement norm ‖φ'‖² = 1 − Σ_D |φ(d)|² in closed form); H_nn
    uses the Rao-Blackwellized exact-|φ|² weights over the captured
    off-D sample set with the semi-stochastic REDUCE local energy of
    the D-masked wavefunction.  All CI-side work is chunked (``ci_chunk``
    rows of [1+n_sd] connected determinants at a time).

    Args:
      d_bits: [m, sorb] CI determinants (int8 0/1).
      sample_bits: [C, sorb] captured sample set (e.g. a DFS capture) —
        weights are computed exactly from |φ|², rows may include D
        members (they are masked off the complement estimator).
      fwd: gradient-free forward ``bits -> [N, 2]`` (defaults to
        model.log_psi; pass the fused forward on TPU).
      restrict: "complement" keeps the exact closed-form H_cn over the
        FULL complement φ' and estimates H_nn over the capture — the
        eigenvalue is only variational when the capture covers the
        complement (coverage is reported).  "capture" replaces the
        complement by φ'' = φ restricted to (capture \\ D): every
        entry is then an exact finite sum (k_det is forced to n_sd),
        so the eigenvalue is a TRUE variational upper bound regardless
        of coverage — the production-safe mode.

    Returns (e_elec, c, info): electronic energy (add system.ecore),
      the (m+1) eigenvector, and a dict of diagnostics.
    """
    from pynqs_tpu.energy.eloc import local_energy_reduce

    if fwd is None:
        fwd = partial(model.log_psi, params)
    ops = tuple(jnp.asarray(np.asarray(x)) for x in system.tables.astuple())
    hpair = (
        None
        if system.tables.hpair_best is None
        else jax.tree.map(jnp.asarray, system.tables.hpair_best)
    )
    table = system.excitation
    d_bits = jnp.asarray(d_bits, jnp.int8)
    m = d_bits.shape[0]
    d_packed = onv_ops.pack_bits(d_bits)
    d_sorted, _ = lut_mod.sort_onv(d_packed, jnp.zeros((m,)))

    lp_d = fwd(d_bits)  # [m, 2]
    p_d = jnp.exp(2.0 * lp_d[..., 0].astype(jnp.float64))

    # ---- captured sample set: forwards + masks (used by H_nn, and in
    # restrict="capture" mode by every coupling) ----
    sample_bits = jnp.asarray(sample_bits, jnp.int8)
    lp_s = fwd(sample_bits)
    s_packed = onv_ops.pack_bits(sample_bits)
    _, member_s = lut_mod.lut_search(d_sorted, s_packed)
    # rows that contribute to the complement estimator: live capture
    # slots (dead capacity padding carries garbage amplitudes) that are
    # NOT in D.  D rows MUST be zero-weighted *before* touching eloc:
    # masked_fwd floors their log-amp by -690, which underflows to an
    # exact f32 zero -> the eloc ψ-ratio is inf there and 0*inf = NaN
    # (the round-4 production NaN; the x64 CPU tests kept e^-690 finite
    # and never saw it).
    keep = ~member_s
    if sample_counts is not None:
        keep = keep & (jnp.asarray(sample_counts) > 0)
    # duplicate captured rows would double-count norm2_c and the H_nn
    # weights while the cap_sorted LUT counts each determinant once in
    # H_cn — keep only the first occurrence of each packed row (DFS
    # captures are unique already; this guards other capture sources)
    s_np = np.ascontiguousarray(np.asarray(s_packed))
    s_keys = s_np.view(
        np.dtype((np.void, s_np.dtype.itemsize * s_np.shape[1]))
    ).ravel()
    _, first_idx = np.unique(s_keys, return_index=True)
    first_mask = np.zeros(s_keys.shape[0], bool)
    first_mask[first_idx] = True
    keep = keep & jnp.asarray(first_mask)
    if int(np.asarray(keep).sum()) == 0:
        raise ValueError(
            "nqs_ci: no usable captured rows — every sample_bits row is "
            "a D member, a duplicate, or a dead (zero-count) capacity "
            "slot; enlarge the capture or shrink the CI space"
        )
    p_s64 = jnp.exp(2.0 * lp_s[..., 0].astype(jnp.float64))

    if restrict == "capture":
        # φ'' = φ restricted to (capture \ D): EVERY matrix entry below
        # is then an exact finite sum over the captured set, so the
        # (m+1)-eigenvalue is a true variational upper bound (no H_nn
        # coverage bias — the round-4 production run's exact-H_cn /
        # 82%-covered-H_nn mix read ABOVE E_VMC).  Exactness of H_nn
        # requires the deterministic eloc, so the full connected space
        # is enumerated (k_det = n_sd).
        keep_np = np.asarray(keep)
        cap_sorted, _ = lut_mod.sort_onv(
            jnp.asarray(np.asarray(s_packed)[keep_np]),
            jnp.zeros((int(keep_np.sum()),)),
        )
        norm2_c = jnp.maximum(jnp.where(keep, p_s64, 0.0).sum(), 1e-30)
        k_det = table.n_sd
    elif restrict == "complement":
        cap_sorted = None
        # exact AR normalization: ‖φ'‖² = 1 − Σ_D |φ(d)|²
        norm2_c = jnp.maximum(1.0 - p_d.sum(), 1e-30)
    else:
        raise ValueError(f"restrict must be 'complement' or 'capture': {restrict}")
    norm_c = jnp.sqrt(norm2_c)

    # ---- H_cc (dense CI block), row-chunked ----
    def hcc_chunk(rows):
        return hij_dense(rows, d_bits, *ops)

    h_cc = jnp.concatenate(
        [
            hcc_chunk(d_bits[i : i + ci_chunk])
            for i in range(0, m, ci_chunk)
        ],
        axis=0,
    ).astype(jnp.float64)

    # ---- H_cn couplings: exact sums over each d_i's connected space ----
    @jax.jit
    def hcn_chunk(rows):
        comb, hij_ci = comb_hij(rows, *ops, hpair, table=table, with_comb=True)
        flat = comb.reshape(-1, comb.shape[-1])
        fpk = onv_ops.pack_bits(flat)
        _, in_d = lut_mod.lut_search(d_sorted, fpk)
        dead = in_d
        if cap_sorted is not None:  # φ'' support: captured \ D only
            _, in_cap = lut_mod.lut_search(cap_sorted, fpk)
            dead = in_d | ~in_cap
        hij_masked = jnp.where(dead.reshape(hij_ci.shape), 0.0, hij_ci)
        lp_c = fwd(flat).reshape(comb.shape[:2] + (2,))
        from pynqs_tpu.ops import cplx

        phi_re, phi_im = cplx.exp_pair(lp_c)
        h_re = (hij_masked * phi_re).sum(-1)
        h_im = (hij_masked * phi_im).sum(-1)
        return h_re, h_im

    h_cn_re = []
    h_cn_im = []
    for i in range(0, m, ci_chunk):
        r, im = hcn_chunk(d_bits[i : i + ci_chunk])
        h_cn_re.append(r)
        h_cn_im.append(im)
    h_cn_re = jnp.concatenate(h_cn_re).astype(jnp.float64) / norm_c
    h_cn_im = jnp.concatenate(h_cn_im).astype(jnp.float64) / norm_c

    # ---- H_nn: exact-weight estimator over the captured off-D set
    # (restrict="capture": exact deterministic sum — k_det = n_sd and
    # the forward zeroes everything outside capture \ D) ----
    def masked_fwd(bits):
        lp = fwd(bits)
        bpk = onv_ops.pack_bits(bits)
        _, member = lut_mod.lut_search(d_sorted, bpk)
        dead = member
        if cap_sorted is not None:
            _, in_cap = lut_mod.lut_search(cap_sorted, bpk)
            dead = member | ~in_cap
        la = jnp.where(dead, lp[..., 0] - 690.0, lp[..., 0])
        return jnp.stack([la, lp[..., 1]], -1)

    logw = jnp.where(keep, 2.0 * lp_s[..., 0], -jnp.inf)
    logw = logw - jnp.max(logw)
    w = jnp.exp(logw.astype(jnp.float64))
    w_live = w.sum()
    w = w / w_live
    # host-sliced eloc dispatches (~1.5 s each at 2048 rows x n_sd):
    # one call over the full capture is minutes of device time in a
    # single dispatch, which the axon tunnel kills (round-5)
    eloc_slice = jax.jit(
        lambda b, k: local_energy_reduce(
            masked_fwd, b, ops, table, k,
            k_det=min(k_det, table.n_sd), n_stoch=n_stoch,
            batch=eloc_batch, hpair=hpair, topk="segmax",
        )[:, 0]
    )
    SLICE = 2048
    n_rows = sample_bits.shape[0]
    if n_rows <= SLICE:
        el0 = eloc_slice(sample_bits, key)
    else:
        el0 = jnp.concatenate([
            jnp.asarray(eloc_slice(sample_bits[s : s + SLICE],
                                   jax.random.fold_in(key, s)))
            for s in range(0, n_rows, SLICE)
        ])
    el64 = jnp.where(keep, el0.astype(jnp.float64), 0.0)
    h_nn = (w * el64).sum()

    # captured-complement coverage diagnostic: Σ_{capture\D}|φ|² vs the
    # closed-form ‖φ'‖² = 1 − Σ_D |φ(d)|².  NOTE: in BOTH modes this
    # reports coverage of the FULL complement (< 1 for partial
    # captures) — capture mode redefines the basis vector on the
    # captured support but keeps reporting how much of φ' it spans
    p_cov = (
        jnp.where(keep, p_s64, 0.0).sum()
        / jnp.maximum(1.0 - p_d.sum(), 1e-30)
    )

    # ---- assemble + eigensolve.  Phases: |d_i⟩ couplings are complex
    # pairs; fold the CI determinants' NQS phases into the basis so the
    # matrix is real-symmetric when φ is (sign-structured) real, and
    # solve the Hermitian problem via its real embedding otherwise. ----
    hr = np.zeros((m + 1, m + 1))
    hi = np.zeros((m + 1, m + 1))
    hr[:m, :m] = np.asarray(h_cc)
    hr[:m, m] = np.asarray(h_cn_re)
    hr[m, :m] = np.asarray(h_cn_re)
    hi[:m, m] = np.asarray(h_cn_im)
    hi[m, :m] = -np.asarray(h_cn_im)
    hr[m, m] = float(h_nn)
    H = hr + 1j * hi
    evals, evecs = np.linalg.eigh(H)
    e = float(evals[0])
    c = evecs[:, 0]
    info = {
        "restrict": restrict,
        "h_nn": float(h_nn),
        "norm2_complement": float(norm2_c),
        "captured_complement_fraction": float(p_cov),
        "ci_mass": float(p_d.sum()),
        "c_m2": float(np.abs(c[-1]) ** 2),
    }
    return e, c, info
