"""TB (lane-block) autotune for the Pallas fused Graph-MPS-RNN forward.

Sweeps block_rows on the flagship shape (dcut=48, 1.31M REDUCE rows)
with VARYING inputs (the axon tunnel caches identical dispatches), one
TPU client, serial.  Run during a training pause window.

  python scripts/tune_fused_tb.py --dcut 48
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dcut", type=int, default=48)
    ap.add_argument("--rows", type=int, default=2048 * 641)
    ap.add_argument("--tbs", type=str, default="256,512,1024,2048")
    ap.add_argument("--n-rep", type=int, default=6)
    args = ap.parse_args()

    from pynqs_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN
    from pynqs_tpu.ops.fused_rnn import graph_mpsrnn_logpsi_fused

    sorb, noa, nob = 40, 15, 15
    model = GraphMPSRNN(
        sorb, noa, nob, dcut=args.dcut, phase_mode="arg",
        norm_mode="mpsrnn", dtype=jnp.float32,
    )
    params = model.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(3)
    norb = sorb // 2

    def rand_bits(n):
        out = np.zeros((n, sorb), np.int8)
        for s, no in ((0, noa), (1, nob)):
            cols = np.argsort(rng.random((n, norb)), axis=1)[:, :no]
            rows = np.repeat(np.arange(n), no)
            out[rows, 2 * cols.ravel() + s] = 1
        return jnp.asarray(out)

    batches = [rand_bits(args.rows) for _ in range(4)]

    for tb in (int(x) for x in args.tbs.split(",")):
        f = jax.jit(
            lambda b, _tb=tb: graph_mpsrnn_logpsi_fused(
                model, params, b, block_rows=_tb
            )
        )
        f(batches[0]).block_until_ready()
        t0 = time.perf_counter()
        for i in range(args.n_rep):
            out = f(batches[i % 4])
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / args.n_rep
        print(
            f"TB={tb:5d}: {dt * 1000:8.2f} ms  "
            f"{args.rows / dt / 1e6:7.1f} Mrows/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
