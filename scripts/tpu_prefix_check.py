"""On-chip validation + timing of the prefix-sharing REDUCE forward.

1. parity: graph_mpsrnn_logpsi_fused_prefix vs the static fused
   forward on the same [parent | children] rows (compiled Mosaic,
   bf16 matmuls — tolerances follow tests/test_fused_rnn.py's TPU
   margins);
2. REDUCE A/B: local_energy_reduce flat (segmax, no dedup) vs
   prefix_fwd on identical inputs — value agreement + step timing at
   the bench configuration (B=2048, k=512/n=128, dcut=48).

One TPU client; VARYING inputs per repetition (CLAUDE.md: the tunnel
caches identical dispatches).

  python scripts/tpu_prefix_check.py [--child-block 128] [--skip-parity]
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child-block", type=int, default=128)
    ap.add_argument("--skip-parity", action="store_true")
    ap.add_argument("--b", type=int, default=2048)
    ap.add_argument("--k-det", type=int, default=512)
    ap.add_argument("--n-stoch", type=int, default=128)
    args = ap.parse_args()

    from pynqs_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from pynqs_tpu.energy.eloc import local_energy_reduce
    from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN
    from pynqs_tpu.ops.fused_rnn import graph_mpsrnn_logpsi_fused
    from pynqs_tpu.ops.fused_rnn_prefix import (
        ReducePrefixForward,
        t_min_process_order,
        sort_children_by_t_min,
    )
    from pynqs_tpu.utils import System
    from pynqs_tpu.utils.checkpoint import load_params

    sys_ = System.from_pth(
        "/root/reference/example/Fe2S2/fe2s2-OO.pth", dtype=np.float32
    )
    model = GraphMPSRNN(
        sys_.sorb, sys_.noa, sys_.nob, dcut=48,
        phase_mode="arg", norm_mode="mpsrnn", dtype=jnp.float32,
    )
    ck = "checkpoints/fe2s2_dcut48_final.pkl"
    params = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32), load_params(ck)
    )
    ops = tuple(
        jnp.asarray(np.asarray(x), jnp.float32) for x in sys_.tables.astuple()
    )
    hpair = jnp.asarray(np.asarray(sys_.tables.hpair), jnp.float32)
    table = sys_.excitation

    from pynqs_tpu.sampler.ar import ar_sampling_dfs, compact_by_count

    B = args.b

    @jax.jit
    def draw(key):
        bits, counts, _ = ar_sampling_dfs(
            model, params, key, 1_000_000, capacity=4096, n_group=4,
            split_depth=6, capacity_root=4096,
        )
        return compact_by_count(bits, counts, B)[0]

    batches = [draw(jax.random.PRNGKey(100 + i)) for i in range(8)]
    pf = ReducePrefixForward(model, params, child_block=args.child_block)
    fwd = partial(graph_mpsrnn_logpsi_fused, model, params)

    if not args.skip_parity:
        # --- kernel parity on random excitation children ---
        rng = np.random.default_rng(0)
        parents = np.asarray(batches[0][:64])
        C = 24
        kids = np.empty((64, C, sys_.sorb), np.int8)
        for b in range(64):
            p = parents[b]
            occ = np.flatnonzero(p)
            vir = np.flatnonzero(1 - p)
            for c in range(C):
                k = p.copy()
                o = rng.choice(occ, size=rng.integers(1, 3), replace=False)
                v = rng.choice(vir, size=len(o), replace=False)
                k[o], k[v] = 0, 1
                kids[b, c] = k
        parents = jnp.asarray(parents)
        kids = jnp.asarray(kids)
        tm = t_min_process_order(model, parents, kids)
        kids_s, tm_s, inv = sort_children_by_t_min(kids, tm)
        lp_p, lp_c = pf(parents, kids_s, tm_s)
        lp_c = jnp.take_along_axis(lp_c, inv[..., None], axis=1)
        ref = np.asarray(
            fwd(jnp.concatenate([parents, kids.reshape(-1, sys_.sorb)], 0))
        )
        got_p = np.asarray(lp_p)
        got_c = np.asarray(lp_c).reshape(-1, 2)
        want_p, want_c = ref[:64], ref[64:]
        da = np.abs(got_p[:, 0] - want_p[:, 0]).max()
        dc = np.abs(got_c[:, 0] - want_c[:, 0]).max()
        pa = np.abs(
            np.exp(1j * got_p[:, 1]) - np.exp(1j * want_p[:, 1])
        ).max()
        pc = np.abs(
            np.exp(1j * got_c[:, 1]) - np.exp(1j * want_c[:, 1])
        ).max()
        print(f"parity: |dlog| parent {da:.2e} child {dc:.2e}  "
              f"|dphase| parent {pa:.2e} child {pc:.2e}", flush=True)
        assert da < 5e-4 and dc < 5e-4, "prefix parity FAILED"

    # --- REDUCE A/B ---
    kw = dict(k_det=args.k_det, n_stoch=args.n_stoch, hpair=hpair,
              topk="segmax")

    @jax.jit
    def eloc_flat(bits, key):
        return local_energy_reduce(fwd, bits, ops, table, key, **kw)

    @jax.jit
    def eloc_pref(bits, key):
        return local_energy_reduce(
            fwd, bits, ops, table, key, prefix_fwd=pf, **kw
        )

    keys = [jax.random.PRNGKey(i) for i in range(8)]
    a = eloc_flat(batches[0], keys[0])
    b = eloc_pref(batches[0], keys[0])
    d = np.abs(np.asarray(a) - np.asarray(b))
    print(f"REDUCE |flat - prefix|: max {d.max():.3e} "
          f"mean {d.mean():.3e}", flush=True)

    for name, fn in (("flat", eloc_flat), ("prefix", eloc_pref)):
        fn(batches[0], keys[0]).block_until_ready()
        t0 = time.perf_counter()
        n_rep = 8
        for i in range(n_rep):
            out = fn(batches[i % 8], keys[i % 8])
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / n_rep
        terms = B * (1 + table.n_sd)
        print(f"{name}: {dt * 1e3:.1f} ms/step  "
              f"{terms / dt:.3e} terms/s", flush=True)


if __name__ == "__main__":
    main()
