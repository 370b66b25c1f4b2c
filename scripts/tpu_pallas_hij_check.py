"""On-chip validation + timing of the VMEM pair-selection kernel.

The round-4 rewrite removes the in-kernel transpose that Mosaic
miscompiled.  Checks, serially (one TPU client, varying inputs):
  1. pair_select_w vs numpy hpair[po][:, pv] on random indices
  2. comb_hij(pair_select="pallas") vs the stacked-split einsum path
     on trained-state samples (values must match to f32 rounding)
  3. comb_hij timing: einsum vs pallas
  4. full flat REDUCE step timing with pallas pair-select at
     (512,128), (256,64), (128,64)

  python scripts/tpu_pallas_hij_check.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(name, fn, args_list, n_rep=8):
    fn(*args_list[0]).block_until_ready()
    t0 = time.perf_counter()
    for i in range(n_rep):
        out = fn(*args_list[i % len(args_list)])
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_rep
    print(f"{name:44s} {dt * 1e3:8.2f} ms", flush=True)
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
    from pynqs_tpu.ops.pallas_hij import pair_select_w
    from pynqs_tpu.utils import System
    from pynqs_tpu.utils.checkpoint import load_params

    # --- 1. raw kernel vs numpy ---
    # ROUND-5 ROOT CAUSE of the round-3/4 "miscompile": this check used
    # a NON-symmetric random hpair, but the kernel contracts the
    # one-hots as h[pv, po] (== h[po, pv] only for symmetric h — which
    # the physical pair matrix always is, integrals.py:328-330).  The
    # "max err 6.77 on hardware" was this harness bug, reproducible in
    # interpret mode too; the kernel itself is exact.
    rng = np.random.default_rng(0)
    npair, n_u, n_v, B = 780, 435, 45, 64
    hp = rng.standard_normal((npair, npair)).astype(np.float32)
    hp = (hp + hp.T) / 2  # physical pair matrices are symmetric
    po = rng.integers(0, npair, size=(B, n_u)).astype(np.int32)
    pv = rng.integers(0, npair, size=(B, n_v)).astype(np.int32)
    want = hp[po[:, :, None], pv[:, None, :]]
    for variant in ("lane", "rowrow"):
        w = np.asarray(pair_select_w(jnp.asarray(po), jnp.asarray(pv),
                                     jnp.asarray(hp), variant=variant))
        err = np.abs(w - want).max()
        print(f"pair_select_w[{variant}] vs numpy: max |err| = {err:.3e}",
              flush=True)
        assert err < 1e-6, f"pair_select_w[{variant}] WRONG on this backend"

    # --- setup for 2-4 ---
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
    hpair = jnp.asarray(np.asarray(t.hpair), jnp.float32)
    table = sys_.excitation
    Bb = 2048

    from pynqs_tpu.sampler.ar import ar_sampling_dfs, compact_by_count

    @jax.jit
    def draw(key):
        bits, counts, _ = ar_sampling_dfs(
            model, params, key, 1_000_000, capacity=4096, n_group=4,
            split_depth=6, capacity_root=4096,
        )
        return compact_by_count(bits, counts, Bb)[0]

    batches = [draw(jax.random.PRNGKey(100 + i)) for i in range(8)]
    keys = [jax.random.PRNGKey(i) for i in range(8)]
    fwd = partial(graph_mpsrnn_logpsi_fused, model, params)

    # --- 2. comb_hij parity einsum vs pallas on trained samples ---
    def hij_of(bits, sel):
        _, hij = comb_hij(
            bits, *ops, hpair, table=table, with_comb=False,
            pair_select=sel,
        )
        return hij

    h_e = np.asarray(jax.jit(partial(hij_of, sel="auto"))(batches[0]),
                     np.float64)
    h_p = np.asarray(jax.jit(partial(hij_of, sel="pallas"))(batches[0]),
                     np.float64)
    d = np.abs(h_e - h_p)
    rel = d.max() / max(np.abs(h_e).max(), 1e-30)
    print(f"comb_hij einsum vs pallas: max |d| {d.max():.3e} "
          f"(rel {rel:.3e})", flush=True)
    assert d.max() < 1e-5, "comb_hij pallas path WRONG"

    # --- 3. comb_hij timing ---
    for sel in ("auto", "pallas"):
        @jax.jit
        def hij_only(bits, _sel=sel):
            return hij_of(bits, _sel).sum()
        bench(f"comb_hij ({_fmt(sel)})", hij_only, [(b,) for b in batches])

    # --- 4. full flat step with pallas pair-select ---
    for kd, ns in ((512, 128), (256, 64), (128, 64)):
        @jax.jit
        def full(bits, key, _kd=kd, _ns=ns):
            return local_energy_reduce(
                fwd, bits, ops, table, key,
                k_det=_kd, n_stoch=_ns, hpair=hpair, topk="segmax",
                pair_select="pallas",
            )
        dt = bench(f"full flat pallas-hij (k={kd}, n={ns})", full,
                   list(zip(batches, keys)))
        terms = Bb * (1 + table.n_sd)
        print(f"    -> {terms / dt:.3e} terms/s", flush=True)


def _fmt(s):
    return {"auto": "stacked-split einsum", "pallas": "VMEM kernel"}[s]


if __name__ == "__main__":
    main()
