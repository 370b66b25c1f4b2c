"""On-chip parity gate: fused Pallas forward vs the XLA log_psi.

Run FIRST in the post-training runbook: every second-stage consumer
(canonical eval, ci_polish, GFMC, NqsCi) trusts
``graph_mpsrnn_logpsi_fused`` for its ψ ratios, and the round-5
R-matrix fold (commit b0e1365) changed the kernel after the last
on-chip validation — Mosaic miscompiles that interpret mode does not
reproduce are precedented in this project (docs/PERF.md round-2).

Checks the flagship structured config (dcut, use_tensor, max_preds
from flags) on rows SAMPLED from the checkpoint state (parity on the
support that production actually evaluates), fused bf16 AND f32
against the XLA forward.  Pass thresholds follow
tests/test_fused_rnn.py margins, widened for bf16 MXU rounding at
dcut=64.

  python scripts/tpu_fused_parity_check.py checkpoints/..._resume.pkl \
      --dcut 64 --use-tensor --max-preds 2
"""

import argparse
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--dcut", type=int, default=64)
    ap.add_argument("--use-tensor", action="store_true")
    ap.add_argument("--max-preds", type=int, default=1)
    ap.add_argument("--rows", type=int, default=2048)
    args = ap.parse_args()

    from pynqs_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from pynqs_tpu.ops.fused_rnn import graph_mpsrnn_logpsi_fused
    from pynqs_tpu.sampler.ar import ar_sampling_dfs, compact_by_count
    from pynqs_tpu.utils.checkpoint import load_params
    from pynqs_tpu.utils.flagship import fe2s2_system, flagship_model

    sys_ = fe2s2_system(np.float32)
    model = flagship_model(
        sys_, args.dcut, use_tensor=args.use_tensor,
        max_preds=args.max_preds,
    )
    params = load_params(args.ckpt)
    if isinstance(params, dict) and "params" in params:
        params = params["params"]
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)

    @jax.jit
    def draw(key):
        bits, counts, _ = ar_sampling_dfs(
            model, params, key, 1_000_000, capacity=4096, n_group=4,
            split_depth=6, capacity_root=4096,
        )
        return compact_by_count(bits, counts, args.rows)[0]

    bits = draw(jax.random.PRNGKey(3))
    ref = np.asarray(jax.jit(partial(model.log_psi, params))(bits),
                     np.float64)
    interp = jax.default_backend() == "cpu"  # CPU smoke test path
    # On-chip tolerances are MISCOMPILE gates, not roundoff gates: the
    # XLA reference forward itself runs TPU default-precision (bf16
    # MXU) matmuls, so both paths carry ~1e-2 quantization in log|ψ|
    # even when the kernel is exact (measured 07:01 this round:
    # f32 max 2.3e-2 / mean 3.5e-3, bf16 max 1.9e-2 / mean 2.3e-3 —
    # the same bf16-scale spread round 4's production eval carried).
    # A real Mosaic miscompile (wrong block, stale ref) shows O(1)+
    # errors — that is what these bounds catch.
    ok = True
    for name, mmdt, tol_log, tol_ph in (
        ("f32", jnp.float32, 1e-1, 2e-1),
        ("bf16", jnp.bfloat16, 2e-1, 4e-1),
    ):
        out = np.asarray(
            jax.jit(partial(graph_mpsrnn_logpsi_fused, model, params,
                            matmul_dtype=mmdt, interpret=interp))(bits),
            np.float64,
        )
        dlog = np.abs(out[:, 0] - ref[:, 0])
        dph = np.abs(np.exp(1j * out[:, 1]) - np.exp(1j * ref[:, 1]))
        print(f"fused[{name}] vs XLA: |dlog| max {dlog.max():.3e} "
              f"mean {dlog.mean():.3e}   |dphase| max {dph.max():.3e} "
              f"mean {dph.mean():.3e}", flush=True)
        if dlog.max() > tol_log or dph.max() > tol_ph:
            print(f"  *** FUSED[{name}] PARITY FAIL (tol {tol_log}/{tol_ph})"
                  " — do NOT trust fused-forward results ***", flush=True)
            ok = False
    print("PARITY: " + ("PASS" if ok else "FAIL"))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
