"""On-chip component budget of the flat REDUCE eloc step (round 4).

Times, serially with VARYING inputs (CLAUDE.md tunnel rules):
  1. comb_hij only (the 16.4M-term Slater-Condon kernel)
  2. selection-only (full REDUCE with a ~free forward: isolates the
     segmax screen + packed payload + tail CDF machinery)
  3. fused forward only, on the step's 1.31M rows (TB 512 and 1024)
  4. full flat step at (k_det, n_stoch) = (512,128), (256,64), (128,64)

Decides where the 5x bench budget goes (docs/PERF.md round-3 table is
stale: segmax + slim packing landed after it).

  python scripts/tpu_step_profile.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(name, fn, args_list, n_rep=8):
    fn(*args_list[0]).block_until_ready()  # compile
    t0 = time.perf_counter()
    for i in range(n_rep):
        out = fn(*args_list[i % len(args_list)])
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_rep
    print(f"{name:42s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    from pynqs_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from pynqs_tpu.energy.eloc import local_energy_reduce
    from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN
    from pynqs_tpu.ops.fused_rnn import graph_mpsrnn_logpsi_fused
    from pynqs_tpu.ops.hamiltonian import comb_hij
    from pynqs_tpu.utils import System
    from pynqs_tpu.utils.checkpoint import load_params

    sys_ = System.from_pth(
        "/root/reference/example/Fe2S2/fe2s2-OO.pth", dtype=np.float32
    )
    model = GraphMPSRNN(
        sys_.sorb, sys_.noa, sys_.nob, dcut=48,
        phase_mode="arg", norm_mode="mpsrnn", dtype=jnp.float32,
    )
    params = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32),
        load_params("checkpoints/fe2s2_dcut48_final.pkl"),
    )
    t = sys_.tables
    ops = tuple(jnp.asarray(np.asarray(x), jnp.float32) for x in t.astuple())
    h1e, h2e, diag1, K, J = ops
    # HPAIR_MODE=dense to A/B the old full-matrix path
    if os.environ.get("HPAIR_MODE", "sect") == "dense":
        hpair = jnp.asarray(np.asarray(t.hpair), jnp.float32)
    else:
        hpair = tuple(
            jnp.asarray(np.asarray(b), jnp.float32) for b in t.hpair_sect
        )
    table = sys_.excitation
    B = 2048

    from pynqs_tpu.sampler.ar import ar_sampling_dfs, compact_by_count

    @jax.jit
    def draw(key):
        bits, counts, _ = ar_sampling_dfs(
            model, params, key, 1_000_000, capacity=4096, n_group=4,
            split_depth=6, capacity_root=4096,
        )
        return compact_by_count(bits, counts, B)[0]

    batches = [draw(jax.random.PRNGKey(100 + i)) for i in range(8)]
    keys = [jax.random.PRNGKey(i) for i in range(8)]
    fwd = partial(graph_mpsrnn_logpsi_fused, model, params)

    # 1. comb_hij only
    @jax.jit
    def hij_only(bits):
        _, hij = comb_hij(
            bits, h1e, h2e, diag1, K, J, hpair, table=table,
            with_comb=False,
        )
        return hij.sum()  # consume

    bench("comb_hij (B=2048, 8026 terms/row)", hij_only,
          [(b,) for b in batches])

    # 2. selection-only: forward replaced by a ~free but input-dependent
    # stub so the selection/payload machinery stays live under DCE
    def cheap_fwd(flat_bits):
        s = flat_bits.astype(jnp.float32).sum(-1)
        return jnp.stack([s * 1e-6, s * 1e-7], -1)

    for kd, ns in ((512, 128), (256, 64), (128, 64)):
        @jax.jit
        def sel_only(bits, key, _kd=kd, _ns=ns):
            return local_energy_reduce(
                cheap_fwd, bits, ops, table, key,
                k_det=_kd, n_stoch=_ns, hpair=hpair, topk="segmax",
            )
        bench(f"selection-only (k={kd}, n={ns})", sel_only,
              list(zip(batches, keys)))

    # 3. forward only, on realistic row counts
    rng = np.random.default_rng(3)
    for nrows, tb in ((2048 * 641, 512), (2048 * 641, 1024),
                      (2048 * 321, 512), (2048 * 193, 512)):
        rows = [
            jnp.asarray(
                np.asarray(batches[i])[
                    rng.integers(0, B, size=nrows)
                ]
            )
            for i in range(3)
        ]

        @jax.jit
        def f_only(r, _tb=tb):
            return graph_mpsrnn_logpsi_fused(
                model, params, r, block_rows=_tb
            ).sum()

        bench(f"fused fwd only ({nrows} rows, TB={tb})", f_only,
              [(r,) for r in rows])

    # 4. full flat step at three (k_det, n_stoch) settings
    for kd, ns in ((512, 128), (256, 64), (128, 64)):
        @jax.jit
        def full(bits, key, _kd=kd, _ns=ns):
            return local_energy_reduce(
                fwd, bits, ops, table, key,
                k_det=_kd, n_stoch=_ns, hpair=hpair, topk="segmax",
            )
        dt = bench(f"full flat (k={kd}, n={ns})", full,
                   list(zip(batches, keys)))
        terms = B * (1 + table.n_sd)
        print(f"    -> {terms / dt:.3e} terms/s", flush=True)


if __name__ == "__main__":
    main()
