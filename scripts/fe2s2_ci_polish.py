"""CI-NQS polish of a trained Fe2S2 checkpoint (one-shot eigensolve).

Reference ladder: VMC -> CI-NQS hybrid (ci_vmc/hybrid.py NqsCi).  Here
the (m+1)-dim effective Hamiltonian of ψ = Σ c_i|d_i⟩ + c_m|φ̂⟩ is
assembled ONCE for the trained NQS (exact closed-form couplings, see
ci/nqs_ci.ci_polish) and diagonalized.  In the default restrict="capture" mode every
matrix entry is an exact finite sum over the captured set, so the
eigenvalue is a TRUE variational upper bound — and ≤ the same-basis
VMC energy by construction.  (restrict="complement" mixes the exact
closed-form H_cn with a coverage-limited H_nn estimate and is NOT a
bound: the round-4 production run lost 1.99 mHa that way — see
docs/PERF.md round-4 negative results.)

  python scripts/fe2s2_ci_polish.py checkpoints/fe2s2_r3_dcut48_g48.pkl \
      --dcut 48 --m 2048
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--dcut", type=int, default=48)
    ap.add_argument("--m", type=str, default="2048",
                    help="CI-set size, or a comma list for a sweep "
                         "(e.g. 2048,4096,8192,16384)")
    ap.add_argument("--n-sample", type=int, default=10_000_000)
    ap.add_argument("--n-group", type=int, default=8)
    ap.add_argument("--split-depth", type=int, default=8)
    ap.add_argument("--capacity", type=int, default=4096)
    ap.add_argument("--k-det", type=int, default=0,
                    help="0 = EXACT deterministic eloc (k_det = n_sd) "
                         "for the E_VMC comparison — no tail noise, so "
                         "E_VMC vs E_polish deltas are exact (capture-"
                         "mode ci_polish always uses k_det = n_sd "
                         "internally)")
    ap.add_argument("--n-stoch", type=int, default=256)
    ap.add_argument("--ci-chunk", type=int, default=128)
    ap.add_argument("--eloc-batch", type=int, default=1024)
    ap.add_argument("--use-tensor", action="store_true")
    ap.add_argument("--max-preds", type=int, default=1)
    ap.add_argument("--restrict", default="capture",
                    choices=["capture", "complement"],
                    help="'capture' = exact truncated-basis variational "
                         "bound (default); 'complement' = exact H_cn + "
                         "estimated H_nn (coverage-biased)")
    ap.add_argument("--fwd-dtype", choices=["bf16", "f32", "xla"],
                    default="bf16",
                    help="forward precision.  The polish eigenvalue "
                         "needs mutually CONSISTENT matrix entries; "
                         "quantization noise that averages out of the "
                         "VMC estimator does not average out of an "
                         "eigensolve.  'xla' = site-loop forward with "
                         "jax_default_matmul_precision=highest (true "
                         "f32 — the fused kernel's f32 dots are still "
                         "Mosaic-default precision)")
    args = ap.parse_args()

    from pynqs_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from pynqs_tpu.ci.nqs_ci import ci_polish
    from pynqs_tpu.energy.eloc import local_energy_reduce
    from pynqs_tpu.ops.fused_rnn import graph_mpsrnn_logpsi_fused
    from pynqs_tpu.sampler.ar import ar_sampling_dfs
    from pynqs_tpu.utils.checkpoint import load_params
    from pynqs_tpu.utils.flagship import fe2s2_system, flagship_model

    sys_ = fe2s2_system(np.float32)
    model = flagship_model(
        sys_, args.dcut, use_tensor=args.use_tensor, max_preds=args.max_preds
    )
    params = load_params(args.ckpt)
    if isinstance(params, dict) and "params" in params:
        params = params["params"]
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
    if args.fwd_dtype == "xla":
        jax.config.update("jax_default_matmul_precision", "highest")
        fwd = partial(model.log_psi, params)
    else:
        mmdt = jnp.float32 if args.fwd_dtype == "f32" else jnp.bfloat16
        fwd = partial(graph_mpsrnn_logpsi_fused, model, params,
                      matmul_dtype=mmdt)
    if jax.default_backend() == "cpu":
        fwd = partial(model.log_psi, params)

    m_list = [int(x) for x in args.m.split(",")]
    t0 = time.time()
    bits, counts, dropped = jax.jit(
        lambda k: ar_sampling_dfs(
            model, params, k, args.n_sample, capacity=args.capacity,
            n_group=args.n_group, split_depth=args.split_depth,
            capacity_root=args.capacity,
        )
    )(jax.random.PRNGKey(11))
    lp_s = fwd(bits)
    live = np.asarray(counts) > 0
    la = np.asarray(lp_s[:, 0], np.float64)
    p = np.where(live, np.exp(2 * (la - la.max())), 0.0)
    order = np.argsort(-p)
    print(f"sampled: {live.sum()} uniques, dropped "
          f"{float(dropped) / args.n_sample:.3%}, t={time.time()-t0:.0f}s",
          flush=True)

    # plain VMC energy on the same captured set (exact weights) for the
    # apples-to-apples delta
    ops = tuple(jnp.asarray(np.asarray(x), jnp.float32)
                for x in sys_.tables.astuple())
    hpair = (None if sys_.tables.hpair is None
             else jnp.asarray(np.asarray(sys_.tables.hpair), jnp.float32))
    kd = args.k_det if args.k_det > 0 else sys_.excitation.n_sd
    ns = args.n_stoch if args.k_det > 0 else 8
    # host-sliced dispatches: one eloc call over the full capture is
    # minutes of device time in one dispatch, which the axon tunnel
    # kills (round-5 canonical-eval crash) — 2048-row slices are 1.5 s
    SLICE = 2048

    @jax.jit
    def el_slice(b, key):
        return local_energy_reduce(
            fwd, b, ops, sys_.excitation, key,
            k_det=min(kd, sys_.excitation.n_sd), n_stoch=ns,
            batch=args.eloc_batch, hpair=hpair, topk="segmax",
        )[:, 0]

    el0 = np.concatenate([
        np.asarray(el_slice(bits[s : s + SLICE],
                            jax.random.PRNGKey(21 + s)))
        for s in range(0, bits.shape[0], SLICE)
    ])
    w = p / p.sum()
    el64 = np.where(live, el0.astype(np.float64), 0.0)
    e_vmc = float((w * el64).sum()) + sys_.ecore
    print(f"E_VMC (exact weights, same set) = {e_vmc:.6f} Ha "
          f"({(e_vmc - sys_.e_ref) * 1000:+.3f} mHa)", flush=True)

    results = []
    for m in m_list:
        d_idx = order[:m]
        d_bits = np.asarray(bits)[d_idx]
        print(f"\n--- m = {m}  (CI set mass "
              f"{p[d_idx].sum() / p.sum():.4f} of captured) ---", flush=True)
        t0 = time.time()
        e, c, info = ci_polish(
            model, params, sys_, d_bits, bits, jax.random.PRNGKey(31),
            fwd=fwd, sample_counts=counts, ci_chunk=args.ci_chunk,
            eloc_batch=args.eloc_batch,
            k_det=kd, n_stoch=ns,
            restrict=args.restrict,
        )
        e_tot = e + sys_.ecore
        print(f"ci_polish: t={time.time()-t0:.0f}s  info={info}")
        print(f"E_CI-NQS = {e_tot:.6f} Ha  "
              f"({(e_tot - sys_.e_ref) * 1000:+.3f} mHa)   "
              f"gain vs VMC {1000 * (e_vmc - e_tot):+.3f} mHa", flush=True)
        results.append((m, e_tot))
    print("\n| m | E_polish (mHa) | gain vs E_VMC (mHa) |")
    print("|---|---|---|")
    for m, e_tot in results:
        print(f"| {m} | {(e_tot - sys_.e_ref) * 1000:+.3f} | "
              f"{1000 * (e_vmc - e_tot):+.3f} |")


if __name__ == "__main__":
    main()
