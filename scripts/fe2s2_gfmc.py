"""GFMC refinement of a trained Fe2S2 flagship state (VERDICT r3 #5).

Reference second stage: gfmc/walker.py:410-629 — fixed-node GFMC with
the trained NQS as trial; Buonaura–Sorella mixed estimator at
population-control depths p = 0..p_steps.  The per-generation ē_l
starts at the VMC energy (walkers drawn from |ψ_T|²) and equilibrates
to the fixed-node mixed energy ≤ E_VMC; p corrects the residual
population-control bias of branching.  (The round-4 run of this script
read +10 mHa at "p=0" because the old estimator paired per-walker
factor products with branch-resampled walker slots — root-caused and
replaced in round 5; see tests/test_gfmc_ci.py dense fixed-node
oracle.)

Trial forwards run through the Pallas fused forward; each iteration's
[W, 1+n_sd] trial block is deduped (walkers concentrate after
branching).  One TPU client; run AFTER training completes.

  python scripts/fe2s2_gfmc.py checkpoints/fe2s2_r3_dcut48_r4structb.pkl \
      --dcut 48 --use-tensor --max-preds 2 --n-walkers 1024 --n-iter 400
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
    ap.add_argument("--use-tensor", action="store_true")
    ap.add_argument("--max-preds", type=int, default=1)
    ap.add_argument("--n-walkers", type=int, default=1024)
    ap.add_argument("--n-iter", type=int, default=400)
    ap.add_argument("--p-steps", type=int, default=10)
    ap.add_argument("--gamma", type=float, default=0.0)
    ap.add_argument("--branch-interval", type=int, default=10)
    ap.add_argument("--tau-lambda", type=float, default=None)
    ap.add_argument("--dedup-max", type=int, default=0,
                    help="unique-row budget for the per-iteration trial "
                         "block (walkers repeat heavily after branching)")
    ap.add_argument("--n-sample", type=int, default=1_000_000,
                    help="DFS sample size for walker initialization")
    ap.add_argument("--init-capacity", type=int, default=8192,
                    help="DFS capture capacity for the walker draw "
                         "(round-4 used 4096, truncating the init "
                         "distribution of a 32k-unique state)")
    ap.add_argument("--tail", type=int, default=200,
                    help="iterations averaged for the reported energies")
    args = ap.parse_args()

    from pynqs_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from pynqs_tpu.gfmc.walker import GFMC, GFMCConfig
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

    # ---- walkers: sample the trial, expand by counts ----
    @jax.jit
    def draw(key):
        bits, counts, _ = ar_sampling_dfs(
            model, params, key, args.n_sample,
            capacity=args.init_capacity, n_group=8,
            split_depth=6, capacity_root=args.init_capacity,
        )
        return bits, counts

    bits, counts = draw(jax.random.PRNGKey(17))
    bits = np.asarray(bits)
    counts = np.asarray(counts).astype(np.float64)
    p = counts / counts.sum()
    rng = np.random.default_rng(5)
    idx = rng.choice(len(p), size=args.n_walkers, p=p)
    walkers = bits[idx]

    cfg = GFMCConfig(
        n_walkers=args.n_walkers,
        n_iter=args.n_iter,
        p_steps=args.p_steps,
        gamma=args.gamma,
        branch_interval=args.branch_interval,
        tau_lambda=args.tau_lambda,
        dedup_unique_max=args.dedup_max,
    )
    g = GFMC(fwd, sys_, cfg)
    t0 = time.time()
    out = g.run(walkers, key=jax.random.PRNGKey(23))
    dt = time.time() - t0
    from pynqs_tpu.gfmc.walker import mixed_energy

    print(f"\nGFMC {args.n_iter} iters, {args.n_walkers} walkers, "
          f"{dt:.1f}s ({dt / args.n_iter * 1e3:.0f} ms/iter)")
    e0g = out["e_gen"]
    print(f"  e_gen[0] (VMC of init draw) = {e0g[0]:.6f} Ha "
          f"({(e0g[0] - sys_.e_ref) * 1000:+.3f} mHa)")
    for pdepth in range(args.p_steps + 1):
        m, se = mixed_energy(out, pdepth, tail=args.tail)
        print(f"  p={pdepth:2d}  E = {m:.6f} +- {se:.6f} Ha   "
              f"Delta = {(m - sys_.e_ref) * 1000:+.3f} mHa")


if __name__ == "__main__":
    main()
