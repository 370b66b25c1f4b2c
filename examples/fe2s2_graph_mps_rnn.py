"""Fe2S2 active space (sorb=40, 15α/15β) with Graph-MPS-RNN.

The flagship configuration (reference example/Fe2S2/
Fe2S2-OO-dcut-20.py): Graph-MPS-RNN over the orbital graph, AR
sampling, REDUCE local energy, AdamW with exponential LR decay.

Run:  python examples/fe2s2_graph_mps_rnn.py [--iters N] [--dcut D]

Integrals: the reference molecule file `fe2s2-OO.pth` if present
(reference energy −116.6056 Ha), else exits.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--dcut", type=int, default=20)
    ap.add_argument("--n-sample", type=int, default=100_000)
    ap.add_argument("--capacity", type=int, default=4096)
    ap.add_argument(
        "--pth",
        default="/root/reference/example/Fe2S2/fe2s2-OO.pth",
    )
    ap.add_argument("--f32", action="store_true", help="float32 (TPU)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN
    from pynqs_tpu.optim.vmc import VMC, VMCConfig
    from pynqs_tpu.sampler import ARSampler
    from pynqs_tpu.utils import System
    from pynqs_tpu.utils.graph import dag_from_order, exchange_matrix, fiedler_order

    if not os.path.exists(args.pth):
        raise SystemExit(f"integral file not found: {args.pth}")
    dtype = np.float32 if args.f32 else np.float64
    sys = System.from_pth(args.pth, dtype=dtype)
    print(
        f"system: sorb={sys.sorb} noa={sys.noa} nob={sys.nob} "
        f"e_ref={sys.e_ref}"
    )

    K = exchange_matrix(sys.h2e, sys.sorb)
    graph = dag_from_order(fiedler_order(K), K, max_preds=2)
    model = GraphMPSRNN(
        sys.sorb, sys.noa, sys.nob, dcut=args.dcut, graph=graph,
        dtype=jnp.float32 if args.f32 else jnp.float64,
    )
    sampler = ARSampler(
        sys.sorb, sys.noa, sys.nob,
        n_sample=args.n_sample, capacity=args.capacity,
    )
    lr_sched = optax.exponential_decay(2e-3, 1, 1 - 5e-4, end_value=5e-4)
    cfg = VMCConfig(
        n_iter=args.iters,
        optimizer=optax.adamw(lr_sched),
        clip_grad=1.0,
        eloc_batch=None,
        log_every=10,
    )
    vmc = VMC(model, sys, sampler, cfg)
    params, hist = vmc.run(jax.random.PRNGKey(0))
    last = np.mean(hist[-100:]) if len(hist) >= 100 else hist[-1]
    print(f"final E(mean last 100) = {last:.6f} Ha")
    if sys.e_ref is not None:
        print(f"Δref = {(last - sys.e_ref) * 1000:+.3f} mHa")


if __name__ == "__main__":
    main()
