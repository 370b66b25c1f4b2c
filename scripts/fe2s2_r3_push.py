"""Round-3 Fe2S2 push: remove the sampling-truncation bias.

Round-2 plateaued at +10.35 mHa with 0.73% of the sampled mass dropped
(slabs x4, cap 4096).  The reference flagship
(example/Fe2S2/Fe2S2-OO-dcut-20.py:103-167) uses n_sample=1e7 with DFS
sampling (use_dfs_sample / min_batch=50000) and MAX_AD_DIM=50000 — no
truncation anywhere.  This script matches that: DFS prefix-partitioned
sampling (dropped < 0.05%), count-exact n >= 1e6, eloc/AD chunked over
all live unique determinants.

  python scripts/fe2s2_r3_push.py --tag a --iters 12000
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dcut", type=int, default=96)
    ap.add_argument("--iters", type=int, default=12000)
    ap.add_argument("--n-sample", type=int, default=2_000_000)
    ap.add_argument("--capacity", type=int, default=4096)
    ap.add_argument("--n-group", type=int, default=8)
    ap.add_argument("--split-depth", type=str, default="8",
                    help="int, or 'auto' = tune from the measured "
                    "live-branch profile of the warm-start state "
                    "(sampler.ar.tune_dfs_split_depth)")
    ap.add_argument("--capacity-root", type=int, default=4096)
    ap.add_argument("--max-unique", type=int, default=24576)
    ap.add_argument("--eloc-batch", type=int, default=4096)
    ap.add_argument("--eloc-dedup-max", type=int, default=None,
                    help="REDUCE forward dedup capacity per eloc chunk")
    ap.add_argument("--grad-batch", type=int, default=8192)
    ap.add_argument("--k-det", type=int, default=512)
    ap.add_argument("--n-stoch", type=int, default=128)
    ap.add_argument("--topk", choices=["exact", "segmax", "approx"],
                    default="exact",
                    help="REDUCE deterministic-set selection; segmax "
                    "is ~15%% faster per step (PERF.md round-3)")
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--lr-end", type=float, default=1e-5)
    ap.add_argument("--sched", choices=["exp", "ref"], default="exp",
                    help="'ref' = the reference flagship schedule "
                    "max(lr*exp(-5e-4*step), lr_end) "
                    "(example/Fe2S2/Fe2S2-OO-dcut-20.py:136-138)")
    ap.add_argument("--clip", type=float, default=0.1)
    ap.add_argument("--clip-stages", type=str, default=None,
                    help="'it1:v1,it2:v2,...' staged max-norm clip "
                    "(reference clip_grad_scheduler); e.g. "
                    "'0:0.01,3000:0.001'")
    ap.add_argument("--from-ckpt", type=str,
                    default=os.path.join(REPO, "checkpoints/fe2s2_r2_dcut96_final.pkl"))
    ap.add_argument("--from-focus", type=str, default=None,
                    help="warm-start from a converted FOCUS MPS file at "
                    "the model dcut (reference flagship params_file, "
                    "example/Fe2S2/Fe2S2-OO-dcut-20.py:88); overrides "
                    "--from-ckpt")
    ap.add_argument("--resume", type=str, default=None)
    ap.add_argument("--grow-from", type=int, default=None,
                    help="grow dcut from this checkpoint dcut")
    ap.add_argument("--use-tensor", action="store_true")
    ap.add_argument("--max-preds", type=int, default=1,
                    help=">1: add extra max-|K| predecessor edges")
    ap.add_argument("--fwd-dtype", choices=["bf16", "f32"], default="bf16",
                    help="fused eloc-forward matmul dtype; f32 also pins "
                         "jax_default_matmul_precision=highest so the XLA "
                         "sampling/grad forwards match (reference trains "
                         "in complex128)")
    ap.add_argument("--exact-weights", action="store_true",
                    help="Rao-Blackwellized |psi|^2 weights over the "
                         "captured set instead of multinomial counts")
    ap.add_argument("--ema", type=float, default=None,
                    help="Polyak-average params with this decay "
                         "(e.g. 0.999); saves <tag>_ema.pkl")
    ap.add_argument("--spin-raising", type=float, default=0.0,
                    help="train on H + c*S-S+ (reference use_spin_raising, "
                    "example/Fe2S2/Fe2S2-OO-dcut-20.py:161-163); logged "
                    "energy then includes the penalty")
    ap.add_argument("--ckpt-interval", type=int, default=500,
                    help="resume-checkpoint save interval (shrink when "
                    "watchdog restarts are costly)")
    ap.add_argument("--tag", type=str, default="a")
    args = ap.parse_args()

    from pynqs_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    if args.fwd_dtype == "f32":
        # match the reference's full-precision ansatz arithmetic
        # (param_dtype=torch.complex128): multi-pass f32 on every XLA
        # matmul (sampling conditionals, AD forward) + f32 fused dots
        jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import optax

    from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN
    from pynqs_tpu.optim.vmc import VMC, VMCConfig
    from pynqs_tpu.sampler import ARSampler
    from pynqs_tpu.utils.checkpoint import load_params, save_params
    from pynqs_tpu.utils.flagship import fe2s2_system, flagship_graph
    from pynqs_tpu.utils.mps_import import grow_dcut

    sys_ = fe2s2_system(np.float32)
    if args.spin_raising > 0:
        from pynqs_tpu.ops.integrals import spin_raising

        h1e_s, h2e_s = spin_raising(sys_.sorb)
        sys_ = sys_.with_operator(h1e_s, h2e_s, args.spin_raising)

    graph = flagship_graph(sys_, args.max_preds)

    def make(d):
        return GraphMPSRNN(
            sys_.sorb, sys_.noa, sys_.nob, dcut=d, graph=graph,
            phase_mode="arg", norm_mode="mpsrnn", dtype=jnp.float32,
            use_tensor=args.use_tensor,
        )

    model = make(args.dcut)
    params = None
    if args.resume is None and args.from_focus is not None:
        from pynqs_tpu.utils.mps_import import load_focus_mpsrnn

        chain = make(args.dcut) if graph is None else GraphMPSRNN(
            sys_.sorb, sys_.noa, sys_.nob, dcut=args.dcut,
            phase_mode="arg", norm_mode="mpsrnn", dtype=jnp.float32,
        )
        params = load_focus_mpsrnn(args.from_focus, chain)
        if graph is not None or args.use_tensor:
            # re-merge into the structured model (extra pred slots /
            # tensor K,U initialize near zero)
            from pynqs_tpu.utils.mps_import import structural_warm_start

            params = structural_warm_start(params, model)
    elif args.resume is None:
        from pynqs_tpu.utils.mps_import import structural_warm_start

        params = load_params(args.from_ckpt)
        if isinstance(params, dict) and "params" in params:
            params = params["params"]
        if args.grow_from is not None:
            params = grow_dcut(
                {k: np.asarray(v) for k, v in params.items()},
                make(args.grow_from), model,
            )
        # structural warm start: missing params (tensor K/U, extra pred
        # slots) initialize fresh near zero; shared ones carry over
        params = structural_warm_start(params, model)

    if args.split_depth == "auto":
        from pynqs_tpu.sampler.ar import tune_dfs_split_depth

        if params is None:
            raise SystemExit("--split-depth auto needs a warm start "
                             "(tune on the state being sampled)")
        split_depth = tune_dfs_split_depth(
            model, params, jax.random.PRNGKey(0), args.n_sample,
            capacity=args.capacity, n_group=args.n_group,
            capacity_root=args.capacity_root,
        )
        print(f"[auto] split_depth = {split_depth}")
    else:
        split_depth = int(args.split_depth)
    sampler = ARSampler(
        sys_.sorb, sys_.noa, sys_.nob,
        n_sample=args.n_sample, capacity=args.capacity,
        dfs_n_group=args.n_group, dfs_split_depth=split_depth,
        dfs_capacity_root=args.capacity_root, max_unique=args.max_unique,
        exact_weights=args.exact_weights,
    )
    if args.sched == "ref":
        def sched(step):
            return jnp.maximum(args.lr * jnp.exp(-5e-4 * step), args.lr_end)
    else:
        sched = optax.exponential_decay(
            args.lr, args.iters, args.lr_end / args.lr
        )
    clip_schedule = None
    if args.clip_stages:
        stages = sorted(
            (int(p.split(":")[0]), float(p.split(":")[1]))
            for p in args.clip_stages.split(",")
        )

        def clip_schedule(it, _stages=stages):
            v = _stages[0][1]
            for s_it, s_v in _stages:
                if it >= s_it:
                    v = s_v
            return v

    tag = f"dcut{args.dcut}_{args.tag}"
    cfg = VMCConfig(
        n_iter=args.iters,
        optimizer=optax.adamw(sched),
        clip_grad=args.clip,
        clip_schedule=clip_schedule,
        eloc_method="reduce",
        eloc_k_det=args.k_det,
        eloc_n_stoch=args.n_stoch,
        eloc_topk=args.topk,
        eloc_batch=args.eloc_batch,
        eloc_dedup_max=args.eloc_dedup_max,
        grad_batch=args.grad_batch,
        ema_decay=args.ema,
        fused_matmul_dtype=args.fwd_dtype,
        log_every=50,
        log_path=os.path.join(REPO, f"logs/fe2s2_r3_{tag}.log"),
        checkpoint_path=os.path.join(
            REPO, f"checkpoints/fe2s2_r3_{tag}_resume.pkl"
        ),
        checkpoint_interval=args.ckpt_interval,
    )
    os.makedirs(os.path.join(REPO, "logs"), exist_ok=True)
    vmc = VMC(model, sys_, sampler, cfg)
    t0 = time.time()
    params, hist = vmc.run(
        jax.random.PRNGKey(len(args.tag) + args.dcut), params=params,
        resume_from=args.resume,
    )
    dt = time.time() - t0
    out = os.path.join(REPO, f"checkpoints/fe2s2_r3_{tag}.pkl")
    save_params(out, jax.tree.map(np.asarray, params))
    if vmc.ema_params is not None:
        save_params(
            os.path.join(REPO, f"checkpoints/fe2s2_r3_{tag}_ema.pkl"),
            jax.tree.map(np.asarray, vmc.ema_params),
        )
    tail = np.mean(hist[-400:])
    best = np.min(hist)
    print(
        f"\nr3 {tag}: {len(hist)} total iters, this run {dt:.0f}s "
        f"({dt / max(args.iters, 1) * 1000:.0f} ms/iter)\n"
        f"mean(400) = {tail:.6f} Ha  ({(tail - sys_.e_ref) * 1000:+.3f} mHa)\n"
        f"best iter = {best:.6f} Ha  ({(best - sys_.e_ref) * 1000:+.3f} mHa)\n"
        f"saved {out}"
    )


if __name__ == "__main__":
    main()
