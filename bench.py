"""Benchmark: local-energy evaluation throughput on the Fe2S2 active space.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The metric is fused comb+Hij local-energy term evaluations per second
per chip (number of ⟨n|H|m⟩ matrix elements produced and contracted
with ψ ratios), on the real Fe2S2 (sorb=40, 15α/15β) integrals if
available, else a synthetic (40,15,15) system.  ``vs_baseline`` is
measured throughput / the reference-A100 estimate in BASELINE.json
(target ≥ 5).
"""

from __future__ import annotations

import json
import time
from functools import partial

import numpy as np

# A100 CUDA extension estimate (BASELINE.md: no published numbers; we
# anchor to ~1e8 Hij terms/s for get_comb_hij_fused on A100-40GB —
# conservative; refine when a measured number lands in BASELINE.json).
A100_HIJ_TERMS_PER_S = 1.0e8


def main():
    import jax
    import jax.numpy as jnp

    from pynqs_tpu.energy.eloc import local_energy_simple
    from pynqs_tpu.models.rbm import RBM
    from pynqs_tpu.ops import onv
    from pynqs_tpu.utils import System

    try:
        sys = System.from_pth(
            "/root/reference/example/Fe2S2/fe2s2-OO.pth", dtype=np.float32
        )
    except Exception:
        rng = np.random.default_rng(0)
        sorb = 40
        from pynqs_tpu.ops import integrals as ints

        h1e = rng.standard_normal((sorb, sorb)) * 0.1
        h1e = (h1e + h1e.T) / 2
        h2e = rng.standard_normal(ints.triangle_size(sorb)) * 0.01
        sys = System.from_integrals(h1e, h2e, sorb, 15, 15, dtype=np.float32)

    model = RBM(sorb=sys.sorb, alpha=2, param_type="complex", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    t = sys.tables
    ops = tuple(jnp.asarray(np.asarray(x), jnp.float32) for x in t.astuple())
    hpair = (
        None if t.hpair is None else jnp.asarray(np.asarray(t.hpair), jnp.float32)
    )
    table = sys.excitation

    B = 2048
    hf = jnp.asarray(onv.hf_bits(sys.sorb, sys.noa, sys.nob))
    bits = jnp.broadcast_to(hf, (B, sys.sorb)).astype(jnp.int8)

    @jax.jit
    def eloc_fn(params, bits):
        return local_energy_simple(
            partial(model.log_psi, params), bits, ops, table, batch=512,
            hpair=hpair,
        )

    # warm-up / compile
    eloc_fn(params, bits).block_until_ready()
    n_rep = 10
    t0 = time.perf_counter()
    for _ in range(n_rep):
        eloc_fn(params, bits).block_until_ready()
    dt = (time.perf_counter() - t0) / n_rep

    terms = B * (1 + table.n_sd)
    rate = terms / dt
    print(
        json.dumps(
            {
                "metric": "hij_eloc_terms_per_sec_per_chip",
                "value": rate,
                "unit": "terms/s",
                "vs_baseline": rate / A100_HIJ_TERMS_PER_S,
            }
        )
    )


if __name__ == "__main__":
    main()
