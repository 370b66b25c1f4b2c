"""Benchmark: flagship REDUCE local-energy throughput on Fe2S2.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Measures the production path end to end: Graph-MPS-RNN (dcut=48, the
Fe2S2 flagship configuration, trained checkpoint when present) with the
semi-stochastic REDUCE local energy (k_det=512 / n_stoch=128, the
training recipe) — fused Slater–Condon comb+Hij kernel, top-k screen,
stratified CDF tail draws, and the Pallas fused ansatz forward for the
ψ(m)/ψ(n) ratio evaluations.  The metric is ⟨n|H|m⟩ matrix elements
produced-and-consumed per second per chip: B × (1 + n_sd) / step-time.

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


def rand_dets(rng, n, sorb, noa, nob):
    norb = sorb // 2
    out = np.zeros((n, sorb), np.int8)
    for s, no in ((0, noa), (1, nob)):
        cols = np.argsort(rng.random((n, norb)), axis=1)[:, :no]
        rows = np.repeat(np.arange(n), no)
        out[rows, 2 * cols.ravel() + s] = 1
    return out


def main():
    import jax
    import jax.numpy as jnp

    from pynqs_tpu.energy.eloc import local_energy_reduce
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
    if os.path.exists(ck):
        from pynqs_tpu.utils.checkpoint import load_params

        params = jax.tree.map(
            lambda x: jnp.asarray(x, jnp.float32), load_params(ck)
        )
    else:
        params = model.init(jax.random.PRNGKey(0))

    t = sys_.tables
    ops = tuple(jnp.asarray(np.asarray(x), jnp.float32) for x in t.astuple())
    hpair = (
        None if t.hpair is None else jnp.asarray(np.asarray(t.hpair), jnp.float32)
    )
    table = sys_.excitation

    B = 2048
    rng = np.random.default_rng(1)
    batches = [
        jnp.asarray(rand_dets(rng, B, sys_.sorb, sys_.noa, sys_.nob))
        for _ in range(8)
    ]
    fwd = partial(graph_mpsrnn_logpsi_fused, model, params)
    if jax.default_backend() == "cpu":  # no Mosaic off-TPU
        fwd = partial(model.log_psi, params)

    @jax.jit
    def eloc_fn(bits, key):
        return local_energy_reduce(
            fwd, bits, ops, table, key,
            k_det=512, n_stoch=128, hpair=hpair,
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
