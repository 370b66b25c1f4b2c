"""Round-2 Fe2S2 push: continue the dcut growth chain with the fused
REDUCE step (103 ms/eloc at B=2048) toward <= 2 mHa vs the FCI-quality
reference -116.6056 Ha.

Stages (each saves checkpoints/fe2s2_r2_dcut{D}.pkl):
  python scripts/fe2s2_r2_push.py --stage 64   # continue dcut=64
  python scripts/fe2s2_r2_push.py --stage 96   # grow 64 -> 96, train

Reference flagship config: example/Fe2S2/Fe2S2-OO-dcut-20.py:103-167.
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
    ap.add_argument("--stage", type=int, default=64)
    ap.add_argument("--iters", type=int, default=6000)
    ap.add_argument("--n-sample", type=int, default=500_000)
    ap.add_argument("--capacity", type=int, default=4096)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--lr-end", type=float, default=1e-5)
    ap.add_argument("--from-ckpt", type=str, default=None)
    ap.add_argument("--sr", action="store_true", help="CG min-SR + SGD")
    ap.add_argument("--sr-damping", type=float, default=1e-3)
    ap.add_argument("--n-cg", type=int, default=50)
    ap.add_argument("--tag", type=str, default="")
    ap.add_argument("--n-slab", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN
    from pynqs_tpu.optim.vmc import VMC, VMCConfig
    from pynqs_tpu.sampler import ARSampler
    from pynqs_tpu.utils import System
    from pynqs_tpu.utils.checkpoint import load_params, save_params
    from pynqs_tpu.utils.mps_import import grow_dcut

    sys_ = System.from_pth(
        "/root/reference/example/Fe2S2/fe2s2-OO.pth", dtype=np.float32
    )

    def make(d):
        return GraphMPSRNN(
            sys_.sorb, sys_.noa, sys_.nob, dcut=d,
            phase_mode="arg", norm_mode="mpsrnn", dtype=jnp.float32,
        )

    model = make(args.stage)
    if args.from_ckpt:
        params = load_params(args.from_ckpt)
        if isinstance(params, dict) and "params" in params:
            params = params["params"]  # VMC resume-checkpoint format
        params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
    elif args.stage == 64:
        params = load_params(os.path.join(REPO, "checkpoints/fe2s2_dcut64.pkl"))
        params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
    else:
        prev = {96: 64, 128: 96}[args.stage]
        src = os.path.join(REPO, f"checkpoints/fe2s2_r2_dcut{prev}.pkl")
        params = load_params(src)
        params = grow_dcut(
            {k: np.asarray(v) for k, v in params.items()},
            make(prev), model,
        )
        params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)

    sampler = ARSampler(
        sys_.sorb, sys_.noa, sys_.nob,
        n_sample=args.n_sample, capacity=args.capacity, n_slab=args.n_slab,
    )
    sched = optax.exponential_decay(
        args.lr, args.iters, args.lr_end / args.lr
    )
    tag = f"dcut{args.stage}{args.tag}"
    cfg = VMCConfig(
        n_iter=args.iters,
        optimizer=optax.sgd(sched) if args.sr else optax.adamw(sched),
        use_sr=args.sr,
        sr_solver="cg",
        sr_damping=args.sr_damping,
        sr_n_cg=args.n_cg,
        clip_grad=0.1,
        eloc_method="reduce",
        eloc_k_det=512,
        eloc_n_stoch=128,
        log_every=50,
        log_path=os.path.join(REPO, f"logs/fe2s2_r2_{tag}.log"),
        checkpoint_path=os.path.join(
            REPO, f"checkpoints/fe2s2_r2_{tag}_resume.pkl"
        ),
        checkpoint_interval=500,
    )
    os.makedirs(os.path.join(REPO, "logs"), exist_ok=True)
    vmc = VMC(model, sys_, sampler, cfg)
    t0 = time.time()
    params, hist = vmc.run(jax.random.PRNGKey(args.stage), params=params)
    dt = time.time() - t0
    out = os.path.join(REPO, f"checkpoints/fe2s2_r2_{tag}.pkl")
    save_params(out, jax.tree.map(np.asarray, params))
    tail = np.mean(hist[-400:])
    best = np.min(hist)
    print(
        f"\nstage dcut={args.stage}: {args.iters} iters in {dt:.0f}s "
        f"({dt / args.iters * 1000:.0f} ms/iter)\n"
        f"mean(400) = {tail:.6f} Ha  ({(tail - sys_.e_ref) * 1000:+.3f} mHa)\n"
        f"best iter = {best:.6f} Ha  ({(best - sys_.e_ref) * 1000:+.3f} mHa)\n"
        f"saved {out}"
    )


if __name__ == "__main__":
    main()
