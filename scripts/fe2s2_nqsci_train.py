"""CI-NQS *training* at Fe2S2 scale (VERDICT r4 #7).

Reference: ci_vmc/hybrid.py:558-675 — the coupled loop: per-iteration
(m+1)-eigensolve of the effective H over [CI space D | NQS complement]
with the NQS gradient driven through the eigen-coefficients
(grad strategies 0/1/2, hybrid.py:60-66,495-527).

Pipeline here:
  1. DFS-capture the trained flagship state, take the top-``--seed``
     determinants by |psi|^2;
  2. grow a heat-bath selected-CI space from that seed
     (`ci/selected.py` — the in-repo DICE/SHCI analog) to ``--m``
     determinants;
  3. run the NqsCi coupled eigensolve+gradient loop warm-started from
     the checkpoint.

The judged number afterwards comes from the canonical eval +
`fe2s2_ci_polish.py --restrict capture` on the updated params; this
script's per-iteration eigenvalue mixes the exact closed-form H_cn
with an MC H_nn (the reference objective), which is a training signal,
not a variational bound.

  python scripts/fe2s2_nqsci_train.py checkpoints/fe2s2_r3_dcut64_r5g64.pkl \
      --dcut 64 --use-tensor --max-preds 2 --m 1024 --iters 200
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--dcut", type=int, default=64)
    ap.add_argument("--use-tensor", action="store_true")
    ap.add_argument("--max-preds", type=int, default=1)
    ap.add_argument("--m", type=int, default=1024,
                    help="selected-CI space size")
    ap.add_argument("--seed-dets", type=int, default=256,
                    help="top capture determinants seeding selection")
    ap.add_argument("--eps1", type=float, default=3e-4,
                    help="heat-bath selection threshold")
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--n-sample", type=int, default=1_000_000)
    ap.add_argument("--capacity", type=int, default=8192)
    ap.add_argument("--grad-strategy", type=int, default=1)
    ap.add_argument("--ci-file", type=str, default=None,
                    help="load the CI space from this save_ci .npz "
                         "(skips capture+selection; e.g. the CPU-"
                         "precomputed checkpoints/fe2s2_hci_m*.npz)")
    ap.add_argument("--ci-chunk", type=int, default=65536,
                    help="flat connected-row chunk for the H_cn forward")
    ap.add_argument("--eloc-batch", type=int, default=1024)
    ap.add_argument("--tag", type=str, default="nqsci")
    args = ap.parse_args()

    from pynqs_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from pynqs_tpu.ci.nqs_ci import NqsCi, NqsCiConfig
    from pynqs_tpu.ci.selected import selected_ci
    from pynqs_tpu.ci.solve import load_ci
    from pynqs_tpu.sampler.ar import ar_sampling_dfs
    from pynqs_tpu.utils.checkpoint import load_params, save_params
    from pynqs_tpu.utils.flagship import fe2s2_system, flagship_model

    sys_ = fe2s2_system(np.float32)
    model = flagship_model(
        sys_, args.dcut, use_tensor=args.use_tensor,
        max_preds=args.max_preds,
    )
    params = load_params(args.ckpt)
    if isinstance(params, dict) and "params" in params:
        params = params["params"]
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)

    if args.ci_file:
        ci, meta = load_ci(args.ci_file)
        e_var = float(meta.get("e_var", np.nan))
        print(f"loaded CI space {args.ci_file}: m={ci.bits.shape[0]}  "
              f"E_var = {e_var:.6f} Ha "
              f"({(e_var - sys_.e_ref) * 1000:+.3f} mHa)", flush=True)
        return _train(args, sys_, model, params, ci)

    # ---- 1. capture the state, rank by |psi|^2 ----
    t0 = time.time()
    bits, counts, dropped = jax.jit(
        lambda key: ar_sampling_dfs(
            model, params, key, args.n_sample, capacity=4096, n_group=4,
            split_depth=6, capacity_root=4096,
        )
    )(jax.random.PRNGKey(11))
    bits = np.asarray(bits)
    counts = np.asarray(counts)
    order = np.argsort(-counts)[: args.seed_dets]
    seed = bits[order][counts[order] > 0]
    print(f"capture: {int((counts > 0).sum())} uniques, "
          f"seed {seed.shape[0]} dets, t={time.time() - t0:.0f}s",
          flush=True)

    # ---- 2. heat-bath selected CI from the seed ----
    t0 = time.time()
    e_var, ci, info = selected_ci(
        sys_, eps1=args.eps1, seed_bits=seed, max_space=args.m,
        chunk=128, verbose=True,
    )
    print(f"selected CI: m={ci.bits.shape[0]}  "
          f"E_var = {e_var:.6f} Ha ({(e_var - sys_.e_ref) * 1000:+.3f} mHa)"
          f"  t={time.time() - t0:.0f}s", flush=True)
    return _train(args, sys_, model, params, ci)


def _train(args, sys_, model, params, ci):
    import jax
    import numpy as np
    import optax

    from pynqs_tpu.ci.nqs_ci import NqsCi, NqsCiConfig
    from pynqs_tpu.utils.checkpoint import save_params

    # ---- 3. coupled CI-NQS training ----
    cfg = NqsCiConfig(
        n_iter=args.iters, lr=args.lr, n_sample=args.n_sample,
        capacity=args.capacity, grad_strategy=args.grad_strategy,
        ci_chunk=args.ci_chunk, eloc_batch=args.eloc_batch,
        log_every=10,
    )
    # gradient-free evaluations (H_nn connected block, no-grad H_cn)
    # ride the Pallas fused forward; the coupled gradient's own
    # forwards keep model.log_psi (the fused kernel has no VJP)
    eval_fwd = None
    if jax.default_backend() != "cpu":
        from functools import partial as _partial

        from pynqs_tpu.ops.fused_rnn import graph_mpsrnn_logpsi_fused

        eval_fwd = _partial(graph_mpsrnn_logpsi_fused, model)
    nq = NqsCi(model, sys_, np.asarray(ci.bits, np.int8), cfg,
               optimizer=optax.adam(args.lr), eval_fwd=eval_fwd)
    t0 = time.time()
    params, c, hist = nq.run(jax.random.PRNGKey(29), params=params)
    dt = time.time() - t0
    out = os.path.join(REPO, f"checkpoints/fe2s2_r5_{args.tag}.pkl")
    save_params(out, jax.tree.map(np.asarray, params))
    h = np.asarray(hist)
    print(f"\nNqsCi {args.iters} iters, {dt:.0f}s "
          f"({dt / max(args.iters, 1):.2f} s/iter)")
    print(f"  e_tot first/10/last: {h[0]:.6f} / "
          f"{h[min(9, len(h) - 1)]:.6f} / {h[-1]:.6f} Ha")
    print(f"  vs e_ref: first {(h[0] - sys_.e_ref) * 1e3:+.3f}  "
          f"last {(h[-1] - sys_.e_ref) * 1e3:+.3f} mHa")
    print(f"  |c_m| (NQS weight in the eigenvector): {abs(c[-1]):.4f}")
    print(f"saved {out}")


if __name__ == "__main__":
    main()
