"""Round-3 TPU micro-benchmarks (run in a window when no training job
holds the chip — one TPU client at a time, varying inputs).

  python scripts/tpu_bench_r3.py [--part fwd|sel|dedup|all]

1. fwd:   fused-forward TB sweep (256/512/1024) at dcut 48 and 96.
2. sel:   REDUCE selection path (mask-residual + packed-sign gathers)
          end-to-end step time vs round-2's 100.9 ms.
3. dedup: unique-row fraction of the REDUCE forward on SAMPLES FROM THE
          TRAINED STATE (not random dets) + dedup'd step time.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pynqs_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pynqs_tpu.energy.eloc import (  # noqa: E402
    local_energy_reduce,
    reduce_unique_count,
)
from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN  # noqa: E402
from pynqs_tpu.ops.fused_rnn import graph_mpsrnn_logpsi_fused  # noqa: E402
from pynqs_tpu.utils import System  # noqa: E402
from pynqs_tpu.utils.checkpoint import load_params  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def rand_dets(rng, n, sorb, noa, nob):
    norb = sorb // 2
    out = np.zeros((n, sorb), np.int8)
    for s, no in ((0, noa), (1, nob)):
        cols = np.argsort(rng.random((n, norb)), axis=1)[:, :no]
        rows = np.repeat(np.arange(n), no)
        out[rows, 2 * cols.ravel() + s] = 1
    return out


def timed(fn, args_list, warm=1):
    for a in args_list[:warm]:
        jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for a in args_list:
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / len(args_list)


def load_fe2s2(dcut, ck):
    sys_ = System.from_pth(
        "/root/reference/example/Fe2S2/fe2s2-OO.pth", dtype=np.float32
    )
    model = GraphMPSRNN(
        sys_.sorb, sys_.noa, sys_.nob, dcut=dcut,
        phase_mode="arg", norm_mode="mpsrnn", dtype=jnp.float32,
    )
    params = load_params(os.path.join(REPO, "checkpoints", ck))
    if isinstance(params, dict) and "params" in params:
        params = params["params"]
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
    return sys_, model, params


def part_fwd():
    rng = np.random.default_rng(0)
    for dcut, ck in ((48, "fe2s2_dcut48_final.pkl"), (96, "fe2s2_r2_dcut96_final.pkl")):
        sys_, model, params = load_fe2s2(dcut, ck)
        N = 262144
        batches = [
            jnp.asarray(rand_dets(rng, N, sys_.sorb, sys_.noa, sys_.nob))
            for _ in range(4)
        ]
        for tb in (256, 512, 1024):
            fn = jax.jit(
                lambda b, _tb=tb: graph_mpsrnn_logpsi_fused(
                    model, params, b, block_rows=_tb
                )
            )
            dt = timed(fn, [(b,) for b in batches])
            print(
                f"fwd dcut={dcut} TB={tb}: {dt * 1e3:.1f} ms "
                f"({N / dt / 1e6:.1f}M rows/s)",
                flush=True,
            )


def _eloc_setup(dcut, ck):
    sys_, model, params = load_fe2s2(dcut, ck)
    t = sys_.tables
    ops = tuple(jnp.asarray(np.asarray(x), jnp.float32) for x in t.astuple())
    hp = None if t.hpair is None else jnp.asarray(np.asarray(t.hpair), jnp.float32)
    from functools import partial

    fwd = partial(graph_mpsrnn_logpsi_fused, model, params)
    return sys_, model, params, ops, hp, sys_.excitation, fwd


def part_sel():
    sys_, model, params, ops, hp, table, fwd = _eloc_setup(
        48, "fe2s2_dcut48_final.pkl"
    )
    rng = np.random.default_rng(1)
    B = 2048
    batches = [
        (
            jnp.asarray(rand_dets(rng, B, sys_.sorb, sys_.noa, sys_.nob)),
            jax.random.PRNGKey(i),
        )
        for i in range(6)
    ]
    fn = jax.jit(
        lambda b, k: local_energy_reduce(
            fwd, b, ops, table, k, k_det=512, n_stoch=128, hpair=hp
        )
    )
    dt = timed(fn, batches, warm=1)
    terms = B * (1 + table.n_sd)
    print(
        f"REDUCE step (new selection): {dt * 1e3:.1f} ms = "
        f"{terms / dt:.3e} terms/s (round-2: 100.9 ms / 1.60e8)",
        flush=True,
    )


def _sampled_batches(sys_, model, params, B, n_batches):
    from pynqs_tpu.sampler.ar import ar_sampling_dfs, compact_by_count

    outs = []
    fn = jax.jit(
        lambda k: compact_by_count(
            *ar_sampling_dfs(
                model, params, k, 1_000_000, capacity=4096, n_group=4,
                split_depth=6, capacity_root=4096,
            )[:2],
            B,
        )
    )
    for i in range(n_batches):
        bits, counts = fn(jax.random.PRNGKey(100 + i))
        outs.append((bits, jax.random.PRNGKey(i)))
    return outs


def part_dedup():
    for dcut, ck in ((48, "fe2s2_dcut48_final.pkl"), (96, "fe2s2_r2_dcut96_final.pkl")):
        sys_, model, params, ops, hp, table, fwd = _eloc_setup(dcut, ck)
        B = 2048
        batches = _sampled_batches(sys_, model, params, B, 4)
        cnt = jax.jit(
            lambda b, k: reduce_unique_count(
                b, ops, table, k, k_det=512, n_stoch=128, hpair=hp
            )
        )
        n_u = int(np.asarray(cnt(*batches[0]))[0])
        total = B * (1 + 512 + 128)
        print(
            f"dcut={dcut}: unique {n_u}/{total} rows "
            f"({100 * n_u / total:.1f}%) on trained-state samples",
            flush=True,
        )
        cap = 1 << int(np.ceil(np.log2(n_u * 1.3)))
        for ded in (None, cap):
            fn = jax.jit(
                lambda b, k, _d=ded: local_energy_reduce(
                    fwd, b, ops, table, k, k_det=512, n_stoch=128,
                    hpair=hp, dedup_unique_max=_d,
                )
            )
            dt = timed(fn, batches, warm=1)
            terms = B * (1 + table.n_sd)
            print(
                f"dcut={dcut} dedup={ded}: {dt * 1e3:.1f} ms = "
                f"{terms / dt:.3e} terms/s",
                flush=True,
            )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", default="all")
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)
    if args.part in ("fwd", "all"):
        part_fwd()
    if args.part in ("sel", "all"):
        part_sel()
    if args.part in ("dedup", "all"):
        part_dedup()
