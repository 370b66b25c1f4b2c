"""On-device exactness + scale checks (round-2 advisor items).

1. hpair one-hot doubles selection vs the triangle-gather path.
2. lut_lookup_mxu vs bisection (64k keys).
3. lut_lookup_merge vs bisection at 1M keys, with timings.
4. Flagship REDUCE timing after the HIGH-precision hpair change.

Run with the chip otherwise idle (CLAUDE.md protocol).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from pynqs_tpu.energy.eloc import local_energy_reduce
from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN
from pynqs_tpu.ops import lut as lut_mod
from pynqs_tpu.ops.fused_rnn import graph_mpsrnn_logpsi_fused
from pynqs_tpu.ops.hamiltonian import comb_hij
from pynqs_tpu.utils import System
from scripts.profile_reduce_r2 import bench, rand_dets


def main():
    sys_ = System.from_pth(
        "/root/reference/example/Fe2S2/fe2s2-OO.pth", dtype=np.float32
    )
    tab = sys_.excitation
    ops = tuple(
        jnp.asarray(np.asarray(t), jnp.float32) for t in sys_.tables.astuple()
    )
    hpair = jnp.asarray(np.asarray(sys_.tables.hpair), jnp.float32)
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rand_dets(rng, 256, sys_.sorb, sys_.noa, sys_.nob))

    # ---- 1. hpair MXU selection vs triangle gather ----
    hij_p = jax.jit(
        lambda b: comb_hij(b, *ops, hpair, table=tab, with_comb=False)[1]
    )(bits)
    hij_g = jax.jit(
        lambda b: comb_hij(b, *ops, None, table=tab, with_comb=False)[1]
    )(bits)
    d = np.abs(np.asarray(hij_p) - np.asarray(hij_g))
    rel = d.max() / np.abs(np.asarray(hij_g)).max()
    print(f"hpair-vs-gather: max abs {d.max():.3e}  rel {rel:.3e}", flush=True)
    assert rel < 1e-5, "hpair path not exact on device!"

    # ---- 2/3. LUT paths on device ----
    for M, meth in ((60_000, "mxu"), (1_000_000, "merge")):
        keys = np.unique(
            rng.integers(0, 2**31, (M + 2000, 2)).astype(np.uint32), axis=0
        )[:M]
        vals = rng.standard_normal((M, 2)).astype(np.float32)
        sk, v0, v1 = lut_mod.sort_onv(
            jnp.asarray(keys), jnp.asarray(vals[:, 0]), jnp.asarray(vals[:, 1])
        )
        sv = jnp.stack([v0, v1], -1)
        Q = 1_000_000
        hit = np.asarray(sk)[rng.integers(0, M, Q // 2)]
        miss = rng.integers(0, 2**31, (Q // 2, 2)).astype(np.uint32)
        qs = jnp.asarray(np.concatenate([hit, miss]))
        lut = lut_mod.WavefunctionLUT(sk, sv)
        f_new = jax.jit(partial(lut.lookup_packed, method=meth))
        f_bis = jax.jit(partial(lut.lookup_packed, method="bisect"))
        out_n, fn_ = f_new(qs)
        out_b, fb_ = f_bis(qs)
        assert (np.asarray(fn_) == np.asarray(fb_)).all()
        np.testing.assert_allclose(
            np.asarray(out_n), np.asarray(out_b), atol=1e-6
        )
        qs2 = [
            jnp.asarray(
                np.concatenate(
                    [np.asarray(sk)[rng.integers(0, M, Q // 2)], miss]
                )
            )
            for _ in range(3)
        ]
        t_new = bench(f"{meth} lookup M={M} Q={Q}", f_new, [(q,) for q in qs2])
        t_bis = bench(f"bisect lookup M={M} Q={Q}", f_bis, [(q,) for q in qs2])
        print(f"  -> {meth} speedup over bisect: {t_bis / t_new:.1f}x", flush=True)

    # ---- 4. flagship REDUCE re-measure ----
    model = GraphMPSRNN(
        sys_.sorb, sys_.noa, sys_.nob, dcut=48,
        phase_mode="arg", norm_mode="mpsrnn", dtype=jnp.float32,
    )
    params = model.init(jax.random.PRNGKey(0))
    fwd = partial(graph_mpsrnn_logpsi_fused, model, params)
    batches = [
        jnp.asarray(rand_dets(rng, 2048, sys_.sorb, sys_.noa, sys_.nob))
        for _ in range(4)
    ]
    f_red = jax.jit(
        lambda b, k: local_energy_reduce(
            fwd, b, ops, tab, k, k_det=512, n_stoch=128, hpair=hpair
        )
    )
    args = [(b, jax.random.PRNGKey(i)) for i, b in enumerate(batches)]
    dt = bench("REDUCE fused k=512/n=128 B=2048 (HIGH hpair)", f_red, args)
    print(f"  -> {2048 * (1 + tab.n_sd) / dt:.3e} terms/s", flush=True)

    # ---- 5. production-sampling truncation loss (VERDICT: measured,
    # bounded) at n_sample=1e6, capacity 4096, slabs ×2 ----
    from pynqs_tpu.sampler.ar import ar_sampling_slabbed
    from pynqs_tpu.utils.checkpoint import load_params

    ck = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "checkpoints", "fe2s2_r2_dcut96_b.pkl",
    )
    if os.path.exists(ck):
        model96 = GraphMPSRNN(
            sys_.sorb, sys_.noa, sys_.nob, dcut=96,
            phase_mode="arg", norm_mode="mpsrnn", dtype=jnp.float32,
        )
        p96 = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), load_params(ck))
        for n_slab in (1, 2, 4):
            _, counts, dropped = ar_sampling_slabbed(
                model96, p96, jax.random.PRNGKey(5), 1_000_000,
                capacity=4096, n_slab=n_slab,
            )
            c = np.asarray(counts)
            print(
                f"sampling n=1e6 cap=4096 slabs={n_slab}: "
                f"unique {(c > 0).sum()}, dropped {int(dropped)} "
                f"({100 * int(dropped) / 1e6:.3f}%)", flush=True,
            )


if __name__ == "__main__":
    main()
