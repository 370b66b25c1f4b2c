"""Round-4 REDUCE step decomposition on the real chip.

Times, at the bench configuration (B=2048, k_det=512, n_stoch=128,
dcut=48 trained state, DFS-sampled inputs, segmax selection):

  step      full local_energy_reduce (the bench.py measurement)
  hij       comb_hij with_comb=False alone
  selmach   selection + tail machinery with a NULL forward
            (step - selmach - hij ~= forward attribution check)
  fwd       fused forward alone on the same 1.31M-row shape
  k-rebal   full step at (k_det, n_stoch) = (256, 64) and (384, 96)

One TPU client at a time; inputs vary per repetition (the axon tunnel
caches identical dispatches).  Usage:
  python scripts/profile_reduce_r4.py [--reps 8]
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pynqs_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pynqs_tpu.energy.eloc import local_energy_reduce  # noqa: E402
from pynqs_tpu.ops.fused_rnn import graph_mpsrnn_logpsi_fused  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
B = 2048


def timed(fn, args_list, warm=1):
    for a in args_list[:warm]:
        jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for a in args_list:
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / len(args_list)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--dcut", type=int, default=48)
    ap.add_argument("--ckpt", type=str, default="fe2s2_dcut48_final.pkl")
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from tpu_bench_r3 import load_fe2s2  # noqa: E402

    sys_, model, params = load_fe2s2(args.dcut, args.ckpt)
    t = sys_.tables
    ops = tuple(jnp.asarray(np.asarray(x), jnp.float32) for x in t.astuple())
    hpair_dense = jnp.asarray(np.asarray(t.hpair), jnp.float32)
    # round-4 default: spin-sector blocks (~5.8x fewer doubles FLOPs)
    hpair = (
        hpair_dense
        if t.hpair_best is None
        else jax.tree.map(
            lambda x: jnp.asarray(np.asarray(x), jnp.float32), t.hpair_best
        )
    )
    table = sys_.excitation

    from pynqs_tpu.sampler.ar import ar_sampling_dfs, compact_by_count

    @jax.jit
    def draw(key):
        bits, counts, _ = ar_sampling_dfs(
            model, params, key, 1_000_000, capacity=4096, n_group=4,
            split_depth=6, capacity_root=4096,
        )
        return compact_by_count(bits, counts, B)[0]

    batches = [draw(jax.random.PRNGKey(100 + i)) for i in range(args.reps)]
    keys = [jax.random.PRNGKey(i) for i in range(args.reps)]
    fwd = partial(graph_mpsrnn_logpsi_fused, model, params)

    def step_fn(k_det, n_stoch, use_fwd=True, pair_select="auto",
                dedup=None):
        f = fwd if use_fwd else (
            lambda rows: jnp.zeros((rows.shape[0], 2), jnp.float32)
        )

        @jax.jit
        def go(bits, key):
            return local_energy_reduce(
                f, bits, ops, table, key,
                k_det=k_det, n_stoch=n_stoch, hpair=hpair, topk="segmax",
                pair_select=pair_select, dedup_unique_max=dedup,
            )

        return go

    pairs = list(zip(batches, keys))

    dt = timed(step_fn(512, 128), pairs)
    print(f"step  k=512/n=128          {dt * 1e3:8.2f} ms   "
          f"{B * (1 + table.n_sd) / dt:.3e} terms/s")

    from pynqs_tpu.ops.hamiltonian import comb_hij

    def hij_fn(hp, pair_select="auto"):
        @jax.jit
        def hij_only(bits):
            _, hij = comb_hij(
                bits, *ops, hp, table=table, with_comb=False,
                pair_select=pair_select,
            )
            return hij
        return hij_only

    for name, hp in (("sector", hpair), ("dense ", hpair_dense)):
        dt = timed(hij_fn(hp), [(b,) for b in batches])
        print(f"hij   comb_hij {name}      {dt * 1e3:8.2f} ms")

    # on-chip parity of the two doubles operands
    a = np.asarray(hij_fn(hpair)(batches[0]), np.float64)
    b_ = np.asarray(hij_fn(hpair_dense)(batches[0]), np.float64)
    print(f"      sector-vs-dense max|dH| {np.abs(a - b_).max():.3e}")

    dt = timed(step_fn(512, 128, use_fwd=False), pairs)
    print(f"selm  null-forward step    {dt * 1e3:8.2f} ms")

    rows = 2048 * (1 + 512 + 128)
    rng = np.random.default_rng(3)
    fbatches = [
        jnp.asarray(
            np.asarray(batches[i % len(batches)])[
                rng.integers(0, B, rows)
            ]
        )
        for i in range(args.reps)
    ]
    dt = timed(jax.jit(fwd), [(fb,) for fb in fbatches])
    print(f"fwd   fused fwd {rows} rows  {dt * 1e3:8.2f} ms")

    for kd, ns in ((384, 96), (256, 64), (128, 32)):
        dt = timed(step_fn(kd, ns), pairs)
        print(f"step  k={kd}/n={ns}            {dt * 1e3:8.2f} ms   "
              f"{B * (1 + table.n_sd) / dt:.3e} terms/s")


if __name__ == "__main__":
    main()
