"""Clean final-state evaluation of a trained Fe2S2 checkpoint.

Reports, under the truncation-free DFS measure (n = 1e7 by default):
  * E (REDUCE, k_det/n_stoch raised for low tail variance) in mHa vs
    the reference e_ref = -116.6056 (FCI-quality e_lst[0]),
  * the spin-raising monitor <S-S+> (reference flagship
    only_output_spin_raising, example/Fe2S2/Fe2S2-OO-dcut-20.py:161-164
    — logged, never trained on),
  * the dropped sampling mass (truncation diagnostic).

  python scripts/eval_fe2s2_final.py checkpoints/fe2s2_r3_dcut20_ref20.pkl
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time
from functools import partial

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--dcut", type=int, default=20)
    ap.add_argument("--n-sample", type=int, default=10_000_000)
    ap.add_argument("--n-group", type=int, default=8)
    ap.add_argument("--split-depth", type=int, default=8)
    ap.add_argument("--capacity", type=int, default=4096)
    ap.add_argument("--k-det", type=int, default=1024,
                    help="0 = EXACT deterministic eloc (k_det = n_sd, "
                         "no stochastic tail): at sorb=40 the full "
                         "connected space is ~7.9k dets, so the exact "
                         "eval is only ~6x the k=1024 cost and removes "
                         "ALL tail noise — the canonical judged config")
    ap.add_argument("--n-stoch", type=int, default=256)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--n-rep", type=int, default=4,
                    help="independent sample/eloc repetitions")
    ap.add_argument("--spin-project", type=int, default=0, choices=[-1, 0, 1],
                    help="evaluate the spin-flip-projected state "
                         "psi_P = (1 + eta*U_SF)/2 psi (models/extra."
                         "SpinProjected): eta=-1 removes the odd-S "
                         "(S=1,3,..) contamination of an Sz=0 state "
                         "with N/2 even parity; sampling stays on the "
                         "base |psi|^2, weights/ratios use psi_P")
    ap.add_argument("--use-tensor", action="store_true",
                    help="checkpoint was trained with tensor coupling")
    ap.add_argument("--max-preds", type=int, default=1,
                    help="checkpoint's multi-predecessor graph width")
    ap.add_argument("--fwd-dtype", choices=["bf16", "f32"], default="bf16",
                    help="fused-forward matmul dtype: f32 tests whether "
                         "bf16 MXU quantization of the ansatz recurrence "
                         "inflates the variational energy (the reference "
                         "trains in complex128)")
    args = ap.parse_args()

    from pynqs_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from pynqs_tpu.energy.eloc import local_energy_reduce
    from pynqs_tpu.ops.fused_rnn import graph_mpsrnn_logpsi_fused
    from pynqs_tpu.ops.integrals import precompute_hij_tables, spin_raising
    from pynqs_tpu.sampler.ar import ar_sampling_dfs
    from pynqs_tpu.utils.checkpoint import load_params
    from pynqs_tpu.utils.flagship import fe2s2_system, flagship_model

    sys_ = fe2s2_system(np.float32)
    model = flagship_model(
        sys_, args.dcut, use_tensor=args.use_tensor, max_preds=args.max_preds
    )
    params = load_params(args.ckpt)
    if isinstance(params, dict) and "params" in params:
        params = params["params"]
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)

    ops = tuple(jnp.asarray(np.asarray(x), jnp.float32)
                for x in sys_.tables.astuple())
    hpair = (None if sys_.tables.hpair is None
             else jnp.asarray(np.asarray(sys_.tables.hpair), jnp.float32))
    ts = precompute_hij_tables(
        *spin_raising(sys_.sorb), sys_.sorb, np.float32
    )
    ops_s = tuple(jnp.asarray(x) for x in (ts.h1e, ts.h2e, ts.diag1, ts.K, ts.J))
    hp_s = None if ts.Hpair is None else jnp.asarray(ts.Hpair)

    mmdt = jnp.float32 if args.fwd_dtype == "f32" else jnp.bfloat16
    fwd = partial(graph_mpsrnn_logpsi_fused, model, params,
                  matmul_dtype=mmdt)
    if jax.default_backend() == "cpu":
        fwd = partial(model.log_psi, params)

    if args.spin_project:
        from pynqs_tpu.ops import cplx as _cplx
        from pynqs_tpu.ops import onv as _onv

        base_fwd, eta = fwd, float(args.spin_project)

        def fwd(bits):  # noqa: F811 — projected wavefunction
            lp = base_fwd(bits)
            lpf = base_fwd(_onv.spin_flip_bits(bits))
            s = _onv.spin_flip_sign(bits).astype(lp.dtype)
            lpf_signed = _cplx.make(
                lpf[..., 0], lpf[..., 1] + jnp.pi * (1.0 - s) / 2.0
            )
            return _cplx.add_exp(lp, lpf_signed, 0.5, 0.5 * eta)

    # Host-orchestrated rep: every DEVICE DISPATCH stays ~1-2 s.  The
    # original single-jit rep packed the full exact eloc (131k rows x
    # 7.9k connected x 2 operators ~ 200 s of device time) into ONE
    # dispatch, which the axon tunnel kills ("TPU worker crashed or
    # restarted", logs/r5_eval_final.log 07:08/07:24) — measured safe
    # granularity: 2048-row eloc slices at 1.5 s, fwd slices ~0.1 s
    # (/tmp/probe2, round-5).
    SLICE = 2048

    @jax.jit
    def draw(key):
        return ar_sampling_dfs(
            model, params, key, args.n_sample, capacity=args.capacity,
            n_group=args.n_group, split_depth=args.split_depth,
            capacity_root=args.capacity,
        )

    fwd_slice = jax.jit(lambda b: fwd(b)[:, 0])
    k_det = args.k_det if args.k_det > 0 else sys_.excitation.n_sd
    n_stoch = args.n_stoch if args.k_det > 0 else 8
    kw = dict(k_det=k_det, n_stoch=n_stoch, batch=args.batch)

    @jax.jit
    def el_slice(b, key):
        return local_energy_reduce(
            fwd, b, ops, sys_.excitation, key, hpair=hpair, **kw)[:, 0]

    @jax.jit
    def sl_slice(b, key):
        return local_energy_reduce(
            fwd, b, ops_s, sys_.excitation, key, hpair=hp_s, **kw)[:, 0]

    def one(key):
        bits, counts, dropped = draw(key)
        n = bits.shape[0]
        # Rao-Blackwellized weights: exact |psi|^2 over the captured
        # unique set (99.9x% of the mass under DFS) instead of the
        # multinomial counts — removes the count noise entirely; the
        # residual bias is the dropped-mass term (reported alongside).
        # dead capacity slots (counts == 0, padding bit rows) can carry
        # NaN/inf through fwd/eloc — mask them out of every reduction
        # (0 * NaN = NaN poisoned the first capacity-32768 eval)
        counts = np.asarray(counts)
        live = counts > 0
        lp = np.concatenate([
            np.asarray(fwd_slice(bits[s : s + SLICE]))
            for s in range(0, n, SLICE)
        ]).astype(np.float64)
        lp_max = lp[live].max()
        p = np.where(live, np.exp(2.0 * (lp - lp_max)), 0.0)
        w_ex = p / p.sum()
        w_ct = counts.astype(np.float64) / max(counts.sum(), 1)
        el = np.concatenate([
            np.asarray(el_slice(bits[s : s + SLICE],
                                jax.random.fold_in(key, 1000 + s)))
            for s in range(0, n, SLICE)
        ]).astype(np.float64)
        sl = np.concatenate([
            np.asarray(sl_slice(bits[s : s + SLICE],
                                jax.random.fold_in(key, 2000 + s)))
            for s in range(0, n, SLICE)
        ]).astype(np.float64)
        el0 = np.where(live, el, 0.0)
        sl0 = np.where(live, sl, 0.0)
        e = (w_ex * el0).sum()
        e_ct = (w_ct * el0).sum()
        var = (w_ex * np.where(live, (el0 - e) ** 2, 0.0)).sum()
        s_ = (w_ex * sl0).sum()
        return e, e_ct, var, s_, float(dropped), float(live.sum())

    es, ecs, vs, ss, ds = [], [], [], [], []
    for i in range(args.n_rep):
        t0 = time.time()
        e, e_ct, var, s, dropped, n_live = (
            np.asarray(x) for x in one(jax.random.PRNGKey(1000 + i))
        )
        es.append(float(e) + sys_.ecore)
        ecs.append(float(e_ct) + sys_.ecore)
        vs.append(float(var))
        ss.append(float(s))
        ds.append(float(dropped) / args.n_sample)
        print(f"rep {i}: E = {es[-1]:.6f} Ha  "
              f"({(es[-1] - sys_.e_ref) * 1000:+.3f} mHa)  "
              f"[count-weighted {(ecs[-1] - sys_.e_ref) * 1000:+.3f}]  "
              f"sigma^2 = {vs[-1]:.4g}  <S-S+> = {ss[-1]:.4f}  "
              f"dropped = {ds[-1]:.3%}  live = {int(n_live)}  "
              f"t = {time.time() - t0:.1f}s",
              flush=True)
    e_m = float(np.mean(es))
    se = float(np.std(es) / np.sqrt(len(es)))
    print(f"\nFINAL  E = {e_m:.6f} +- {se:.6f} Ha   "
          f"Delta = {(e_m - sys_.e_ref) * 1000:+.3f} mHa   "
          f"<S-S+> = {np.mean(ss):.4f}   dropped = {np.mean(ds):.3%}")


if __name__ == "__main__":
    main()
