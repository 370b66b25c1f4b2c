"""Benchmark: flagship REDUCE local-energy throughput on Fe2S2.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Measures the production path end to end: Graph-MPS-RNN (dcut=48, the
Fe2S2 flagship ladder configuration, trained checkpoint when present)
with the semi-stochastic REDUCE local energy (k_det=256 / n_stoch=64,
the VMCConfig production default — see the rebalance note below) —
fused Slater–Condon comb+Hij kernel with spin-sector Hpair doubles,
segmax top-k screen + packed-sign single-gather selection, stratified
CDF tail draws, and the Pallas fused ansatz forward for the ψ(m)/ψ(n)
ratio evaluations.  The metric is ⟨n|H|m⟩
matrix elements produced-and-consumed per second per chip:
B × (1 + n_sd) / step-time.

Inputs are SAMPLES OF THE TRAINED STATE (round-3 change): production
eloc always runs on the sampler's output, whose connected spaces
overlap — random determinants would understate the dedup'd production
rate.  Without a checkpoint the bench falls back to random inputs and
no dedup (stated in the metric name).

Measurement protocol (CLAUDE.md): inputs VARY per repetition (the axon
tunnel caches identical dispatches), one TPU client, serial.
``vs_baseline`` anchors to the reference-A100 estimate in BASELINE.json
(~1e8 Hij terms/s for get_comb_hij_fused; no published number exists).
"""

from __future__ import annotations

import json
import os
import time
from functools import partial

import numpy as np

A100_HIJ_TERMS_PER_S = 1.0e8
# round-4 rebalance (VERDICT r3 #3): the VMCConfig production default
# (k_det=256, n_stoch=64) replaces the flagship-training override
# (512/128).  Validated on-chip (scripts/kdet_rebalance_check.py,
# docs/PERF.md round-4): estimator bias zero within MC error at both
# configs; (256,64) doubles the per-sample tail RMS (0.34 -> 0.69 Ha)
# for half the psi forwards (48.9 -> 29.7 ms/step).  Flagship training
# keeps (512,128) where gradient SNR per step matters more than rate.
K_DET, N_STOCH, B = 256, 64, 2048


def rand_dets(rng, n, sorb, noa, nob):
    norb = sorb // 2
    out = np.zeros((n, sorb), np.int8)
    for s, no in ((0, noa), (1, nob)):
        cols = np.argsort(rng.random((n, norb)), axis=1)[:, :no]
        rows = np.repeat(np.arange(n), no)
        out[rows, 2 * cols.ravel() + s] = 1
    return out


def main():
    from pynqs_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from pynqs_tpu.energy.eloc import local_energy_reduce, reduce_unique_count
    from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN
    from pynqs_tpu.ops.fused_rnn import graph_mpsrnn_logpsi_fused
    from pynqs_tpu.utils import System

    try:
        sys_ = System.from_pth(
            "/root/reference/example/Fe2S2/fe2s2-OO.pth", dtype=np.float32
        )
    except Exception:
        rng = np.random.default_rng(0)
        sorb = 40
        from pynqs_tpu.ops import integrals as ints

        h1e = rng.standard_normal((sorb, sorb)) * 0.1
        h1e = (h1e + h1e.T) / 2
        h2e = rng.standard_normal(ints.triangle_size(sorb)) * 0.01
        sys_ = System.from_integrals(h1e, h2e, sorb, 15, 15, dtype=np.float32)

    model = GraphMPSRNN(
        sys_.sorb, sys_.noa, sys_.nob, dcut=48,
        phase_mode="arg", norm_mode="mpsrnn", dtype=jnp.float32,
    )
    ck = os.path.join(os.path.dirname(__file__) or ".",
                      "checkpoints", "fe2s2_dcut48_final.pkl")
    trained = os.path.exists(ck)
    if trained:
        from pynqs_tpu.utils.checkpoint import load_params

        params = jax.tree.map(
            lambda x: jnp.asarray(x, jnp.float32), load_params(ck)
        )
    else:
        params = model.init(jax.random.PRNGKey(0))

    t = sys_.tables
    ops = tuple(jnp.asarray(np.asarray(x), jnp.float32) for x in t.astuple())
    # spin-sector Hpair blocks: the round-4 doubles operand (exact,
    # ~5.8x fewer MXU FLOPs than the dense pair matrix)
    hpair = (
        None
        if t.hpair_best is None
        else jax.tree.map(
            lambda x: jnp.asarray(np.asarray(x), jnp.float32), t.hpair_best
        )
    )
    table = sys_.excitation

    rng = np.random.default_rng(1)
    if trained:
        # production input distribution: DFS-sample the trained state
        from pynqs_tpu.sampler.ar import ar_sampling_dfs, compact_by_count

        @jax.jit
        def draw(key):
            bits, counts, _ = ar_sampling_dfs(
                model, params, key, 1_000_000, capacity=4096, n_group=4,
                split_depth=6, capacity_root=4096,
            )
            return compact_by_count(bits, counts, B)[0]

        batches = [draw(jax.random.PRNGKey(100 + i)) for i in range(8)]
        # Forward dedup measured OFF at dcut=48 (round-4 profile: the
        # 1.3M-row key sorts + unsort gather cost more than the ~31%-
        # unique forward saves — 3.15e8 with dedup vs 3.30e8 without at
        # k=512/128).  BENCH_DEDUP=1 re-enables (sized from the
        # measured unique count +30%) for A/B and for dcut >= 96.
        dedup = None
        if os.environ.get("BENCH_DEDUP") == "1":
            n_u = int(
                np.asarray(
                    reduce_unique_count(
                        batches[0], ops, table, jax.random.PRNGKey(9),
                        k_det=K_DET, n_stoch=N_STOCH, hpair=hpair,
                    )
                )[0]
            )
            dedup = min(int(n_u * 1.3), B * (1 + K_DET + N_STOCH))
    else:
        batches = [
            jnp.asarray(rand_dets(rng, B, sys_.sorb, sys_.noa, sys_.nob))
            for _ in range(8)
        ]
        dedup = None

    fwd = partial(graph_mpsrnn_logpsi_fused, model, params)
    if jax.default_backend() == "cpu":  # no Mosaic off-TPU
        fwd = partial(model.log_psi, params)

    # forward mode: "flat" (default — dedup'd full forward; fastest
    # measured at norb=20: 57 ms vs prefix 91 ms, see
    # ops/fused_rnn_prefix.py MEASURED note), "prefix" reuses each
    # sample's recurrence prefix for its screened/tail children
    # (ops/fused_rnn_prefix; chain models only).  A/B with BENCH_MODE.
    mode = os.environ.get("BENCH_MODE", "flat")
    prefix_fwd = None
    if mode == "prefix" and jax.default_backend() != "cpu":
        from pynqs_tpu.ops.fused_rnn_prefix import (
            ReducePrefixForward,
            prefix_available,
        )

        if prefix_available(model):
            prefix_fwd = ReducePrefixForward(
                model, params,
                child_block=int(os.environ.get("BENCH_CHILD_BLOCK", 128)),
            )
            dedup = None

    @jax.jit
    def eloc_fn(bits, key):
        return local_energy_reduce(
            fwd, bits, ops, table, key,
            k_det=K_DET, n_stoch=N_STOCH, hpair=hpair,
            topk="segmax",  # sort-free selection: unbiased (tested,
            # tests/test_sampling_r2.py gradient-quality gate), -12 ms
            dedup_unique_max=dedup,
            prefix_fwd=prefix_fwd,
        )

    keys = [jax.random.PRNGKey(i) for i in range(8)]
    eloc_fn(batches[0], keys[0]).block_until_ready()  # compile
    n_rep = 8
    t0 = time.perf_counter()
    for i in range(n_rep):
        out = eloc_fn(batches[i % 8], keys[i % 8])
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_rep

    terms = B * (1 + table.n_sd)
    rate = terms / dt
    print(
        json.dumps(
            {
                "metric": "flagship_reduce_eloc_hij_terms_per_sec_per_chip",
                "value": rate,
                "unit": "terms/s",
                "vs_baseline": rate / A100_HIJ_TERMS_PER_S,
            }
        )
    )


if __name__ == "__main__":
    main()
