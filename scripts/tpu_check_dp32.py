"""Validate the fused-forward dp=32 tier on the REAL TPU chip.

Checks, serially in one process (one TPU client — CLAUDE.md):
  1. Mosaic compiles the dp=32 kernel (dcut=20 chain, the flagship
     shape, and dcut=8 — the __graft_entry__ shape).
  2. Agreement with the XLA forward on hardware (f32 matmul dtype).
  3. Timing vs the dp=64 shape at dcut=48 for reference (varying
     inputs; the tunnel caches identical dispatches).

Run AFTER training releases the chip.
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")
from pynqs_tpu.utils.jaxcache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN  # noqa: E402
from pynqs_tpu.ops.fused_rnn import graph_mpsrnn_logpsi_fused  # noqa: E402


def rand_bits(rng, n, sorb, noa, nob):
    norb = sorb // 2
    out = np.zeros((n, sorb), np.int8)
    for s, no in ((0, noa), (1, nob)):
        cols = np.argsort(rng.random((n, norb)), axis=1)[:, :no]
        rows = np.repeat(np.arange(n), no)
        out[rows, 2 * cols.ravel() + s] = 1
    return out


def check(dcut, sorb, noa, nob, n=2048, time_it=True, tensor=False):
    kw = {}
    if tensor:
        from pynqs_tpu.utils.graph import dag_from_order

        rng0 = np.random.default_rng(0)
        w = np.abs(rng0.standard_normal((sorb // 2, sorb // 2)))
        kw = dict(
            graph=dag_from_order(list(range(sorb // 2)), w, max_preds=3),
            use_tensor=True, dcut_cmpr=8,
        )
    model = GraphMPSRNN(
        sorb, noa, nob, dcut=dcut, dtype=jnp.float32,
        phase_mode="arg", norm_mode="mpsrnn", **kw,
    )
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(dcut)
    batches = [jnp.asarray(rand_bits(rng, n, sorb, noa, nob))
               for _ in range(6)]
    fwd = jax.jit(partial(
        graph_mpsrnn_logpsi_fused, model, params, matmul_dtype=jnp.float32
    ))
    t0 = time.perf_counter()
    out = np.asarray(fwd(batches[0]))
    print(f"dcut={dcut}: compile+run {time.perf_counter()-t0:.1f}s")
    # the XLA reference MUST be precision-pinned: at the TPU default
    # (single-pass bf16) the REFERENCE side carries ~3e-3 log-amp noise
    # and the comparison measures XLA's quantization, not the kernel
    with jax.default_matmul_precision("highest"):
        ref = np.asarray(jax.jit(partial(model.log_psi, params))(batches[0]))
    da = np.abs(out[:, 0] - ref[:, 0]).max()
    dp = np.abs(np.exp(1j * out[:, 1]) - np.exp(1j * ref[:, 1])).max()
    print(f"dcut={dcut}: |Δlog amp|={da:.2e}  |Δphase|={dp:.2e}")
    assert da < 5e-4 and dp < 5e-3, "fused/XLA disagreement on TPU"
    if time_it:
        fwd(batches[1]).block_until_ready()
        t0 = time.perf_counter()
        for i in range(5):
            o = fwd(batches[1 + i])
        o.block_until_ready()
        dt = (time.perf_counter() - t0) / 5
        print(f"dcut={dcut}: {dt*1e3:.2f} ms / {n} rows "
              f"= {n/dt:.3g} rows/s")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    check(8, 12, 3, 3, n=1024, time_it=False)   # __graft_entry__ shape
    check(20, 40, 15, 15)                        # flagship dp=32
    check(48, 40, 15, 15)                        # dp=64 reference tier
    # tensor coupling + multi-pred DAG at dp=32 (the plateau-attack
    # model for the follow-on Fe2S2 run)
    check(20, 40, 15, 15, tensor=True)
    print("DP32 TPU CHECK OK")
