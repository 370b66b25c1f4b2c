"""On-chip eloc-vs-SIMPLE parity for the REDUCE k-rebalance (VERDICT r3 #3).

The bench/flagship REDUCE config moves (k_det, n_stoch) = (512, 128)
-> (256, 64): half the psi forwards per sample (29.7 vs 48.9 ms/step
measured, 5.42e8 vs 3.30e8 terms/s).  The estimator is unbiased at any
(k, n) (tie-exact/segmax top set + inverse-CDF |H| tail; gradient gate
tests/test_sampling_r2.py::test_vmc_rebalanced_kn_gradient_unbiased).
This script prices the VARIANCE on the real trained Fe2S2 state:

  - SIMPLE exact eloc per sample (all 1+n_sd forwards) as oracle,
  - REDUCE at (512,128) and (256,64), several independent tail keys,
  - reports batch-energy bias vs SIMPLE, per-sample RMS deviation, and
    the spread of the batch energy over keys (what training feels).

Inputs are DFS samples of the trained state; inputs vary per
repetition (the axon tunnel caches identical dispatches); one client.

  python scripts/kdet_rebalance_check.py [--ckpt fe2s2_dcut48_final.pkl]
"""

import argparse
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pynqs_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pynqs_tpu.energy.eloc import (  # noqa: E402
    local_energy_reduce,
    local_energy_simple,
)
from pynqs_tpu.ops.fused_rnn import graph_mpsrnn_logpsi_fused  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
B = 2048


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=str, default="fe2s2_dcut48_final.pkl")
    ap.add_argument("--dcut", type=int, default=48)
    ap.add_argument("--n-batches", type=int, default=4)
    ap.add_argument("--n-keys", type=int, default=4)
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from tpu_bench_r3 import load_fe2s2

    sys_, model, params = load_fe2s2(args.dcut, args.ckpt)
    t = sys_.tables
    ops = tuple(jnp.asarray(np.asarray(x), jnp.float32) for x in t.astuple())
    hpair = jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float32), t.hpair_best
    )
    table = sys_.excitation
    fwd = partial(graph_mpsrnn_logpsi_fused, model, params)

    from pynqs_tpu.sampler.ar import ar_sampling_dfs, compact_by_count

    @jax.jit
    def draw(key):
        bits, counts, _ = ar_sampling_dfs(
            model, params, key, 1_000_000, capacity=4096, n_group=4,
            split_depth=6, capacity_root=4096,
        )
        return compact_by_count(bits, counts, B)[0]

    @jax.jit
    def simple(bits):
        return local_energy_simple(
            fwd, bits, ops, table, batch=256, hpair=hpair
        )

    def reduce_fn(kd, ns):
        @jax.jit
        def go(bits, key):
            return local_energy_reduce(
                fwd, bits, ops, table, key,
                k_det=kd, n_stoch=ns, hpair=hpair, topk="segmax",
            )
        return go

    configs = {(512, 128): reduce_fn(512, 128), (256, 64): reduce_fn(256, 64)}
    stats = {c: {"bias": [], "rms": [], "espread": []} for c in configs}

    for b in range(args.n_batches):
        bits = draw(jax.random.PRNGKey(500 + b))
        e_ref = np.asarray(simple(bits), np.float64)[:, 0]
        for c, fn in configs.items():
            es = []
            for k in range(args.n_keys):
                e = np.asarray(
                    fn(bits, jax.random.PRNGKey(7000 + 97 * b + k)),
                    np.float64,
                )[:, 0]
                stats[c]["bias"].append((e - e_ref).mean())
                stats[c]["rms"].append(np.sqrt(((e - e_ref) ** 2).mean()))
                es.append(e.mean())
            stats[c]["espread"].append(np.std(es))
        print(f"batch {b}: E_SIMPLE/sample mean {e_ref.mean():+.6f} Ha, "
              f"sample std {e_ref.std():.4f} Ha")

    print(f"\nper-sample eloc, {args.n_batches} batches x {args.n_keys} keys "
          f"(mHa; batch SE of the mean from sampling alone = "
          f"sample_std/sqrt({B}) — the floor the tail noise adds to)")
    for c in configs:
        s = stats[c]
        print(
            f"  k={c[0]:3d}/n={c[1]:3d}:  bias {np.mean(s['bias'])*1e3:+8.4f} "
            f"+- {np.std(s['bias'])/np.sqrt(len(s['bias']))*1e3:.4f}   "
            f"per-sample RMS dev {np.mean(s['rms'])*1e3:8.3f}   "
            f"batch-energy spread over keys {np.mean(s['espread'])*1e3:8.4f}"
        )


if __name__ == "__main__":
    main()
