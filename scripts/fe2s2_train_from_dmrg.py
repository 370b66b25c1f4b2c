"""Headline experiment: VMC-optimize Fe2S2 from the DMRG warm start.

The reference's flagship run (example/Fe2S2/Fe2S2-OO-dcut-20.py):
Graph-MPS-RNN dcut=20 warm-started from FOCUS DMRG, optimized with
AdamW + REDUCE local energy toward e_ref = -116.6056 Ha.  The import
alone measures -116.5865 Ha (+19.1 mHa); training should close part
of that gap.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--n-sample", type=int, default=100_000)
    ap.add_argument("--capacity", type=int, default=1024)
    ap.add_argument("--lr", type=float, default=2e-4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN
    from pynqs_tpu.optim.vmc import VMC, VMCConfig
    from pynqs_tpu.sampler import ARSampler
    from pynqs_tpu.utils import System
    from pynqs_tpu.utils.mps_import import load_focus_mpsrnn

    f32 = jax.default_backend() != "cpu"
    sys = System.from_pth(
        "/root/reference/example/Fe2S2/fe2s2-OO.pth",
        dtype=np.float32 if f32 else np.float64,
    )
    model = GraphMPSRNN(
        sys.sorb, sys.noa, sys.nob, dcut=20,
        phase_mode="arg", norm_mode="mpsrnn",
        dtype=jnp.float32 if f32 else jnp.float64,
    )
    params = load_focus_mpsrnn(
        "/root/reference/example/Fe2S2/fe2s2-OO-dcut-20-focus-1e-8.pth", model
    )
    sampler = ARSampler(
        sys.sorb, sys.noa, sys.nob,
        n_sample=args.n_sample, capacity=args.capacity,
    )
    cfg = VMCConfig(
        n_iter=args.iters,
        optimizer=optax.adamw(args.lr),
        clip_grad=0.1,
        eloc_method="reduce",
        eloc_k_det=512,
        eloc_n_stoch=128,
        eloc_batch=256,
        log_every=10,
    )
    vmc = VMC(model, sys, sampler, cfg)
    t0 = time.time()
    params, hist = vmc.run(jax.random.PRNGKey(0), params=params)
    dt = time.time() - t0
    tail = np.mean(hist[-25:])
    print(f"\n{args.iters} iterations in {dt:.1f}s "
          f"({dt / args.iters * 1000:.0f} ms/iter incl host)")
    print(f"E start (import)  = -116.5865 Ha")
    print(f"E end mean(25)    = {tail:.6f} Ha")
    print(f"Delta vs e_ref    = {(tail - sys.e_ref) * 1000:+.2f} mHa")


if __name__ == "__main__":
    main()
