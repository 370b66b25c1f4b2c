"""Spin-filtered subspace energy of a trained state on its captured set.

The trained Fe2S2 flagship states carry even-S spin contamination
(<S-S+> ~ 4.5, measured flip-antisymmetric => S=2,4), and the [2Fe-2S]
spin-ladder spacing (~J/2 per S(S+1) unit ~ 1-2 mHa) prices that at
several mHa — likely the bulk of the ~+10 plateau.  Retraining with a
penalty works but is slow; this script instead measures, WITHOUT
retraining, the best energy available in the spin Krylov subspace

    span{ v,  S²v,  (S²)² v }          (S² = S⁻S⁺ on Sz=0)

of the state restricted to its DFS-captured determinant set S (99.8%
of the mass).  All operator applications are S-restricted matvecs via
`local_energy_sample_space` (the SAMPLE_SPACE kernel: comb_hij + LUT
— reference ElocMethod.SAMPLE_SPACE), so every reported energy is the
exact Rayleigh quotient of a CI vector supported on S — variational.

Reports: E(v) on S (baseline), E of the projected vectors
(6-S²)/6 · v and (6-S²)(20-S²)/120 · v, and the generalized-eigen
optimum over the 3-dim subspace, each with its <S-S+>.

Runs entirely on CPU (f64 tables) — no TPU client needed.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--dcut", type=int, default=20)
    ap.add_argument("--n-sample", type=int, default=10_000_000)
    ap.add_argument("--n-group", type=int, default=8)
    ap.add_argument("--split-depth", type=int, default=9)
    ap.add_argument("--capacity", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--use-tensor", action="store_true")
    ap.add_argument("--max-preds", type=int, default=1)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from pynqs_tpu.energy.eloc import local_energy_sample_space
    from pynqs_tpu.ops import onv
    from pynqs_tpu.ops.integrals import precompute_hij_tables, spin_raising
    from pynqs_tpu.ops.lut import WavefunctionLUT
    from pynqs_tpu.sampler.ar import ar_sampling_dfs
    from pynqs_tpu.utils.checkpoint import load_params
    from pynqs_tpu.utils.flagship import fe2s2_system, flagship_model

    sys_ = fe2s2_system(np.float64)
    model = flagship_model(
        sys_, args.dcut, use_tensor=args.use_tensor, max_preds=args.max_preds
    )
    params = load_params(args.ckpt)
    if isinstance(params, dict) and "params" in params:
        params = params["params"]
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)

    t0 = time.time()
    bits, counts, dropped = jax.jit(
        lambda k: ar_sampling_dfs(
            model, params, k, args.n_sample, capacity=args.capacity,
            n_group=args.n_group, split_depth=args.split_depth,
            capacity_root=args.capacity,
        )
    )(jax.random.PRNGKey(7))
    live = np.asarray(counts) > 0
    bits = np.asarray(bits)[live]
    U = bits.shape[0]
    print(f"captured set: {U} dets, dropped mass "
          f"{float(dropped)/args.n_sample:.3%}  ({time.time()-t0:.0f}s)",
          flush=True)

    # amplitudes of the trained state on S (f32 forward, f64 algebra)
    lp = np.asarray(model.log_psi(params, jnp.asarray(bits)))
    v = np.exp(lp[:, 0].astype(np.float64)) * np.exp(1j * lp[:, 1].astype(np.float64))
    v /= np.linalg.norm(v)

    bits_j = jnp.asarray(bits, jnp.int8)
    packed = onv.pack_bits(bits_j)

    th = sys_.tables
    ops_h = tuple(jnp.asarray(np.asarray(x), jnp.float64) for x in th.astuple())
    hp_h = None  # CPU: triangle-gather path beats the one-hot MXU path
    ts = precompute_hij_tables(*spin_raising(sys_.sorb), sys_.sorb, np.float64)
    ops_s = tuple(jnp.asarray(x, jnp.float64)
                  for x in (ts.h1e, ts.h2e, ts.diag1, ts.K, ts.J))
    hp_s = None  # CPU: gather path

    def pair_of(u):
        mag = np.abs(u)
        return jnp.asarray(
            np.stack([np.log(np.maximum(mag, 1e-280)), np.angle(u)], -1)
        )

    from pynqs_tpu.ops.hamiltonian import hij_diagonal

    ones_pair = jnp.zeros((U, 2), jnp.float64)

    def matvec(ops, hpair, diag, u):
        """y = O_S u (operator restricted to the captured set).

        The SAMPLE_SPACE kernel is called with a UNIT reference
        amplitude so the 'ratios' are just u(m) — no division by u(x),
        which can be ~0 for projected vectors.  Scale u to ‖u‖_∞ = 1
        first so the log-pair LUT values stay in exp range, and add
        the diagonal term back analytically."""
        scale = np.abs(u).max()
        un = u / scale
        lut = WavefunctionLUT.build(bits_j, pair_of(un))
        el = np.asarray(
            local_energy_sample_space(
                bits_j, ones_pair, lut, ops, sys_.excitation,
                batch=args.batch, hpair=hpair,
            )
        )
        off = (el[:, 0] - diag) + 1j * el[:, 1]
        return scale * (off + diag * un)

    diag_h = np.asarray(hij_diagonal(bits_j, ops_h[2], ops_h[3]))
    diag_s = np.asarray(hij_diagonal(bits_j, ops_s[2], ops_s[3]))

    def H(u):
        return matvec(ops_h, hp_h, diag_h, u)

    def S2(u):
        return matvec(ops_s, hp_s, diag_s, u)

    e_ref = sys_.e_ref
    ecore = sys_.ecore

    def report(name, u):
        n2 = np.vdot(u, u).real
        e = (np.vdot(u, H(u)).real / n2) + ecore
        ss = np.vdot(u, S2(u)).real / n2
        print(f"{name:28s} E = {e:.6f} Ha  ({(e - e_ref) * 1000:+.3f} mHa)"
              f"   <S-S+> = {ss:.4f}", flush=True)
        return e, ss

    t0 = time.time()
    b0 = v
    b1 = S2(b0)
    b2 = S2(b1)
    print(f"S2 Krylov built ({time.time()-t0:.0f}s)", flush=True)

    report("v (captured-set RQ)", b0)
    report("(6-S2)/6 v", (6.0 * b0 - b1) / 6.0)
    report("(6-S2)(20-S2)/120 v", (120.0 * b0 - 26.0 * b1 + b2) / 120.0)

    # generalized eigenproblem in span{b0, b1, b2}
    B = np.stack([b0, b1, b2], axis=1)  # [U, 3]
    t0 = time.time()
    HB = np.stack([H(B[:, j]) for j in range(3)], axis=1)
    print(f"H matvecs done ({time.time()-t0:.0f}s)", flush=True)
    A = B.conj().T @ HB
    M = B.conj().T @ B
    A = (A + A.conj().T) / 2
    M = (M + M.conj().T) / 2
    from scipy.linalg import eigh

    w, c = eigh(A, M)
    u_opt = B @ c[:, 0]
    e_opt = w[0] + ecore
    ss_opt = np.vdot(u_opt, S2(u_opt)).real / np.vdot(u_opt, u_opt).real
    print(f"{'subspace optimum':28s} E = {e_opt:.6f} Ha  "
          f"({(e_opt - e_ref) * 1000:+.3f} mHa)   <S-S+> = {ss_opt:.4f}")


if __name__ == "__main__":
    main()
