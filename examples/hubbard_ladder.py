"""Capability ladder on Hubbard systems (no PySCF required).

Stage 1: RBM + exact enumeration + SR        (BASELINE.json config 1)
Stage 2: AR-RNN + exact AR sampling + SR     (config 2 analog)
Stage 3: Transformer decoder, multi-config   (config 3 analog)
Stage 4: 2D Hubbard + Graph-MPS-RNN (snake)  (config 4 analog)

Run:  python examples/hubbard_ladder.py [--stage N]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np


def fci_energy(sys):
    import sys as _s

    _s.path.insert(0, "tests")
    import oracle
    from pynqs_tpu.ops.integrals import decompress_h2e

    dets = oracle.fci_space(sys.sorb, sys.noa, sys.nob)
    H = oracle.dense_h(dets, sys.h1e, decompress_h2e(sys.h2e, sys.sorb))
    return np.linalg.eigvalsh(H)[0], len(dets)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=1)
    ap.add_argument("--iters", type=int, default=400)
    args = ap.parse_args()

    import jax

    # NOTE: a site plugin may pin the platform regardless of the
    # JAX_PLATFORMS env var — force it via config.  CPU gets x64 (the
    # f32 SR solve at damping 1e-3 is numerically singular).
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    import optax

    from pynqs_tpu.models import GraphMPSRNN, RBM, RNNWavefunction
    from pynqs_tpu.models.graph_mps_rnn import grid_snake_graph
    from pynqs_tpu.models.transformer import DecoderWavefunction
    from pynqs_tpu.optim.vmc import VMC, VMCConfig
    from pynqs_tpu.sampler import ARSampler, ExactSampler
    from pynqs_tpu.utils import System
    from pynqs_tpu.ops.integrals import hubbard_2d

    if args.stage == 1:
        sys = System.hubbard_1d(4, 2, 2, u=4.0)
        model = RBM(sorb=sys.sorb, alpha=4, init_scale=0.1)
        sampler = ExactSampler(sys.sorb, sys.noa, sys.nob)
        cfg = VMCConfig(
            n_iter=args.iters, use_sr=True, sr_damping=1e-3,
            optimizer=optax.sgd(5e-2), log_every=25,
        )
    elif args.stage == 2:
        sys = System.hubbard_1d(6, 3, 3, u=4.0)
        model = RNNWavefunction(sys.sorb, sys.noa, sys.nob, hidden=32)
        sampler = ARSampler(sys.sorb, sys.noa, sys.nob, n_sample=1 << 15, capacity=400)
        cfg = VMCConfig(
            n_iter=args.iters, use_sr=True, sr_damping=1e-2,
            optimizer=optax.sgd(5e-2), log_every=25,
        )
    elif args.stage == 3:
        sys = System.hubbard_1d(3, 2, 1, u=4.0)
        model = DecoderWavefunction(
            sys.sorb, sys.noa, sys.nob, n_layer=1, n_head=2, d_model=16
        )
        sampler = ARSampler(sys.sorb, sys.noa, sys.nob, n_sample=1 << 13, capacity=9)
        cfg = VMCConfig(
            n_iter=args.iters, use_sr=True, sr_damping=1e-3,
            optimizer=optax.sgd(5e-2), log_every=25,
        )
    elif args.stage == 4:
        hc, eri = hubbard_2d(3, 2, u=4.0)
        sys = System.from_spatial(hc, eri, 3, 3)
        model = GraphMPSRNN(
            sys.sorb, sys.noa, sys.nob, dcut=12, graph=grid_snake_graph(3, 2)
        )
        sampler = ARSampler(sys.sorb, sys.noa, sys.nob, n_sample=1 << 15, capacity=400)
        cfg = VMCConfig(
            n_iter=args.iters, optimizer=optax.adamw(5e-3), log_every=25
        )
    else:
        raise SystemExit("stage must be 1-4")

    e0, n_fci = fci_energy(sys)
    print(f"stage {args.stage}: sorb={sys.sorb} FCI={e0:.6f} ({n_fci} dets)")
    vmc = VMC(model, sys, sampler, cfg)
    _, hist = vmc.run(jax.random.PRNGKey(0))
    tail = np.mean(hist[-20:])
    print(f"VMC mean(20) = {tail:.6f}  Δ = {(tail - e0) * 1000:+.3f} mHa")


if __name__ == "__main__":
    main()
