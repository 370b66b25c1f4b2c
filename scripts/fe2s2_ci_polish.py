"""CI-NQS polish of a trained Fe2S2 checkpoint (one-shot eigensolve).

Reference ladder: VMC -> CI-NQS hybrid (ci_vmc/hybrid.py NqsCi).  Here
the (m+1)-dim effective Hamiltonian of ψ = Σ c_i|d_i⟩ + c_m|φ̂⟩ is
assembled ONCE for the trained NQS (exact closed-form couplings, see
ci/nqs_ci.ci_polish) and diagonalized: variationally ≤ the plain VMC
energy, no retraining.

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
    ap.add_argument("--m", type=int, default=2048)
    ap.add_argument("--n-sample", type=int, default=10_000_000)
    ap.add_argument("--n-group", type=int, default=8)
    ap.add_argument("--split-depth", type=int, default=8)
    ap.add_argument("--capacity", type=int, default=4096)
    ap.add_argument("--k-det", type=int, default=1024)
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
    fwd = partial(graph_mpsrnn_logpsi_fused, model, params)
    if jax.default_backend() == "cpu":
        fwd = partial(model.log_psi, params)

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
    d_idx = order[: args.m]
    d_bits = np.asarray(bits)[d_idx]
    print(f"sampled: {live.sum()} uniques, dropped "
          f"{float(dropped) / args.n_sample:.3%}, CI set mass "
          f"{p[d_idx].sum() / p.sum():.4f} of captured, t={time.time()-t0:.0f}s",
          flush=True)

    # plain VMC energy on the same captured set (exact weights) for the
    # apples-to-apples delta
    ops = tuple(jnp.asarray(np.asarray(x), jnp.float32)
                for x in sys_.tables.astuple())
    hpair = (None if sys_.tables.hpair is None
             else jnp.asarray(np.asarray(sys_.tables.hpair), jnp.float32))
    el = local_energy_reduce(
        fwd, bits, ops, sys_.excitation, jax.random.PRNGKey(21),
        k_det=min(args.k_det, sys_.excitation.n_sd), n_stoch=args.n_stoch,
        batch=args.eloc_batch, hpair=hpair, topk="segmax",
    )
    w = p / p.sum()
    el64 = np.where(live, np.asarray(el[:, 0], np.float64), 0.0)
    e_vmc = float((w * el64).sum()) + sys_.ecore
    print(f"E_VMC (exact weights, same set) = {e_vmc:.6f} Ha "
          f"({(e_vmc - sys_.e_ref) * 1000:+.3f} mHa)", flush=True)

    t0 = time.time()
    e, c, info = ci_polish(
        model, params, sys_, d_bits, bits, jax.random.PRNGKey(31),
        fwd=fwd, sample_counts=counts, ci_chunk=args.ci_chunk,
        eloc_batch=args.eloc_batch, k_det=args.k_det, n_stoch=args.n_stoch,
        restrict=args.restrict,
    )
    e_tot = e + sys_.ecore
    print(f"ci_polish: t={time.time()-t0:.0f}s  info={info}")
    print(f"\nE_CI-NQS = {e_tot:.6f} Ha  "
          f"({(e_tot - sys_.e_ref) * 1000:+.3f} mHa)   "
          f"gain vs VMC {1000 * (e_vmc - e_tot):+.3f} mHa")


if __name__ == "__main__":
    main()
