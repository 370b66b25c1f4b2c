"""Prefix-sharing REDUCE forward: win-or-negative sweep (VERDICT r4 #8).

The round-4 prefix path (`ops/fused_rnn_prefix.py`) was measured exact
but SLOWER than the flat fused forward at the flagship shape
(norb=20, dcut=48).  Its hypothesized win region is deeper chains /
wider hiddens, where the shared-parent prefix amortizes more MXU work
per child.  This sweep times the full REDUCE eloc step flat vs prefix
on synthetic chain models (random params, random valid ONVs — a
throughput measurement needs no trained state) at:

    (sorb=40, dcut=64), (sorb=40, dcut=96), (sorb=80, dcut=64)

using Hubbard integrals for the connected-space tables.  One TPU
client; varying inputs per rep (the tunnel caches identical
dispatches).

  python scripts/tpu_prefix_sweep.py [--b 2048] [--k-det 512]
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def random_onvs(rng, n, sorb, noa, nob):
    bits = np.zeros((n, sorb), np.int8)
    for i in range(n):
        a = rng.choice(sorb // 2, size=noa, replace=False)
        b = rng.choice(sorb // 2, size=nob, replace=False)
        bits[i, 2 * a] = 1
        bits[i, 2 * b + 1] = 1
    return bits


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=2048)
    ap.add_argument("--k-det", type=int, default=512)
    ap.add_argument("--n-stoch", type=int, default=128)
    ap.add_argument("--child-block", type=int, default=128)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--configs", type=str, default="40:64,40:96,80:64",
                    help="comma list of sorb:dcut")
    ap.add_argument("--interpret", action="store_true",
                    help="pallas interpret mode (CPU smoke test)")
    args = ap.parse_args()

    from pynqs_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from pynqs_tpu.energy.eloc import local_energy_reduce
    from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN
    from pynqs_tpu.ops.fused_rnn import graph_mpsrnn_logpsi_fused
    from pynqs_tpu.ops.fused_rnn_prefix import ReducePrefixForward
    from pynqs_tpu.utils import System

    rng = np.random.default_rng(7)
    B = args.b
    for part in args.configs.split(","):
        sorb, dcut = (int(x) for x in part.split(":"))
        noa = nob = sorb // 4
        sys_ = System.hubbard_1d(sorb // 2, noa, nob, u=4.0,
                                 dtype=np.float32)
        model = GraphMPSRNN(
            sorb, noa, nob, dcut=dcut,
            phase_mode="arg", norm_mode="mpsrnn", dtype=jnp.float32,
        )
        params = model.init(jax.random.PRNGKey(sorb + dcut))
        params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
        ops = tuple(jnp.asarray(np.asarray(x), jnp.float32)
                    for x in sys_.tables.astuple())
        hpair = (None if sys_.tables.hpair is None
                 else jnp.asarray(np.asarray(sys_.tables.hpair), jnp.float32))
        table = sys_.excitation
        fwd = partial(graph_mpsrnn_logpsi_fused, model, params,
                      interpret=args.interpret)
        pf = ReducePrefixForward(model, params,
                                 child_block=args.child_block,
                                 interpret=args.interpret)
        kw = dict(k_det=min(args.k_det, table.n_sd),
                  n_stoch=args.n_stoch, hpair=hpair, topk="segmax")

        @jax.jit
        def eloc_flat(bits, key, _f=fwd, _o=ops, _t=table, _kw=kw):
            return local_energy_reduce(_f, bits, _o, _t, key, **_kw)

        @jax.jit
        def eloc_pref(bits, key, _f=fwd, _o=ops, _t=table, _p=pf, _kw=kw):
            return local_energy_reduce(_f, bits, _o, _t, key,
                                       prefix_fwd=_p, **_kw)

        batches = [jnp.asarray(random_onvs(rng, B, sorb, noa, nob))
                   for _ in range(args.reps)]
        keys = [jax.random.PRNGKey(i) for i in range(args.reps)]
        a = eloc_flat(batches[0], keys[0])
        b = eloc_pref(batches[0], keys[0])
        d = np.abs(np.asarray(a) - np.asarray(b))
        print(f"[sorb={sorb} dcut={dcut} n_sd={table.n_sd}] "
              f"|flat - prefix| max {d.max():.3e}", flush=True)
        for name, fn in (("flat", eloc_flat), ("prefix", eloc_pref)):
            fn(batches[0], keys[0]).block_until_ready()
            t0 = time.perf_counter()
            for i in range(args.reps):
                out = fn(batches[i % len(batches)], keys[i % len(keys)])
            out.block_until_ready()
            dt = (time.perf_counter() - t0) / args.reps
            terms = B * (1 + table.n_sd)
            print(f"  {name:6s}: {dt * 1e3:8.1f} ms/step  "
                  f"{terms / dt:.3e} terms/s", flush=True)


if __name__ == "__main__":
    main()
