"""Round-2 TPU profile: flagship GraphMPSRNN + REDUCE eloc on Fe2S2.

Measurement protocol per CLAUDE.md: one TPU client, serial, VARYING
inputs per repetition (the tunnel caches identical dispatches).
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
from pynqs_tpu.ops import onv
from pynqs_tpu.ops.hamiltonian import comb_hij
from pynqs_tpu.utils import System


def rand_dets(rng, n, sorb, noa, nob):
    """n random determinants in the (noa, nob) sector."""
    norb = sorb // 2
    out = np.zeros((n, sorb), np.int8)
    for s, no in ((0, noa), (1, nob)):
        cols = np.argsort(rng.random((n, norb)), axis=1)[:, :no]
        rows = np.repeat(np.arange(n), no)
        out[rows, 2 * cols.ravel() + s] = 1
    return out


def bench(name, fn, args_list, reps=8):
    jax.block_until_ready(fn(*args_list[0]))  # compile
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(*args_list[i % len(args_list)])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt * 1000:.2f} ms", flush=True)
    return dt


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
    B = 2048
    # 8 distinct input batches (vary per repetition)
    batches = [
        jnp.asarray(rand_dets(rng, B, sys_.sorb, sys_.noa, sys_.nob))
        for _ in range(8)
    ]
    print(f"n_sd = {tab.n_sd}, terms per batch = {B * (1 + tab.n_sd):.3e}")

    # ---- kernel ----
    f_hij = jax.jit(lambda b: comb_hij(b, *ops, hpair, table=tab, with_comb=False)[1])
    f_comb = jax.jit(lambda b: comb_hij(b, *ops, hpair, table=tab, with_comb=True)[0])
    dt = bench("comb_hij hij-only B=2048", f_hij, [(b,) for b in batches])
    print(f"  -> {B * (1 + tab.n_sd) / dt:.3e} terms/s")
    bench("comb_hij with comb  B=2048", f_comb, [(b,) for b in batches])

    # ---- top-k / scatter / categorical pieces ----
    absh = [jnp.abs(f_hij(b)[:, 1:]) for b in batches[:4]]
    f_topk = jax.jit(lambda a: jax.lax.top_k(a, 512)[1])
    f_atopk = jax.jit(lambda a: jax.lax.approx_max_k(a, 512)[1])
    bench("top_k k=512 [2048,7875]", f_topk, [(a,) for a in absh])
    bench("approx_max_k k=512", f_atopk, [(a,) for a in absh])

    def scat(a, idx):
        return a.at[jnp.arange(a.shape[0])[:, None], idx].set(0.0).sum()

    idxs = [f_topk(a) for a in absh]
    bench("scatter-zero [2048,512]", jax.jit(scat), list(zip(absh, idxs)))

    def cat(a, k):
        logits = jnp.log(jnp.maximum(a, 1e-30))
        return jax.random.categorical(k, logits[:, None, :], axis=-1, shape=(a.shape[0], 128))

    keys = [jax.random.PRNGKey(i) for i in range(4)]
    bench("categorical 128 draws", jax.jit(cat), list(zip(absh, keys)))

    # ---- flagship forward ----
    for dcut in (32, 48):
        for dt_m in (jnp.float32, jnp.bfloat16):
            model = GraphMPSRNN(
                sys_.sorb, sys_.noa, sys_.nob, dcut=dcut,
                phase_mode="arg", norm_mode="mpsrnn", dtype=jnp.float32,
            )
            params = model.init(jax.random.PRNGKey(0))
            if dt_m == jnp.bfloat16:
                params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
                model = GraphMPSRNN(
                    sys_.sorb, sys_.noa, sys_.nob, dcut=dcut,
                    phase_mode="arg", norm_mode="mpsrnn", dtype=jnp.bfloat16,
                )
            NF = 2048 * 128  # rows per forward slab
            fwd_in = [
                jnp.repeat(b, 128, axis=0)[:NF] for b in batches[:4]
            ]
            f_fwd = jax.jit(lambda bb, p=params, m=model: m.log_psi(p, bb))
            d = bench(
                f"GraphMPSRNN fwd dcut={dcut} {dt_m.__name__} rows={NF}",
                f_fwd, [(b,) for b in fwd_in],
            )
            print(f"  -> {NF / d:.3e} rows/s")

    # ---- full REDUCE eloc (flagship config) ----
    model = GraphMPSRNN(
        sys_.sorb, sys_.noa, sys_.nob, dcut=48,
        phase_mode="arg", norm_mode="mpsrnn", dtype=jnp.float32,
    )
    params = model.init(jax.random.PRNGKey(0))
    for tk in ("exact", "approx"):
        for kd, nst in ((512, 128), (256, 64)):
            f_red = jax.jit(
                lambda b, k, kd=kd, nst=nst, tk=tk: local_energy_reduce(
                    partial(model.log_psi, params), b, ops, tab, k,
                    k_det=kd, n_stoch=nst, hpair=hpair, topk=tk,
                )
            )
            args = [(b, jax.random.PRNGKey(i)) for i, b in enumerate(batches[:4])]
            d = bench(f"REDUCE eloc k={kd}/n={nst} topk={tk} B=2048", f_red, args)
            print(f"  -> {B * (1 + tab.n_sd) / d:.3e} terms/s")


if __name__ == "__main__":
    main()
