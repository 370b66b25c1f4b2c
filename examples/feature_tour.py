"""Feature tour on a 6-site Hubbard chain (runs on CPU in ~2 min).

Demonstrates the API surface end to end — the reference's full
pre-train → VMC → projector ladder with no external quantum-chemistry
dependency:
  1. exact FCI reference via the dense Slater–Condon matrix,
  2. native CISD (Davidson on the singles-doubles space) + CITrain
     pre-training of the ansatz onto it (the reference starts this
     rung from pyscf UCISD — interface_pyscf.py:13-144),
  3. VMC with the DFS prefix-partitioned AR sampler + REDUCE eloc,
  4. matrix-free CG min-SR refinement,
  5. RESTRICTED (given-states) deterministic optimization,
  6. fixed-node GFMC on the trained NQS trial with walker dedup.

Usage:  JAX_PLATFORMS=cpu python examples/feature_tour.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu"))
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from pynqs_tpu.ci.wavefunction import CIWavefunction  # noqa: E402
from pynqs_tpu.gfmc.walker import GFMC, GFMCConfig, ci_trial_log_psi  # noqa: E402
from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN  # noqa: E402
from pynqs_tpu.ops.hamiltonian import hij_dense  # noqa: E402
from pynqs_tpu.optim.vmc import VMC, VMCConfig  # noqa: E402
from pynqs_tpu.sampler import ARSampler, RestrictedSampler  # noqa: E402
from pynqs_tpu.utils import System, fci  # noqa: E402


def main():
    sys_ = System.hubbard_1d(6, 2, 2, u=4.0)
    space = fci.fci_bits(sys_.sorb, sys_.noa, sys_.nob)
    ops = tuple(jnp.asarray(np.asarray(x)) for x in sys_.tables.astuple())
    H = np.asarray(hij_dense(jnp.asarray(space), jnp.asarray(space), *ops))
    w, v = np.linalg.eigh(H)
    e0 = w[0]
    print(f"FCI reference: {e0:.6f} Ha over {space.shape[0]} determinants")

    # ---- 2. native CISD + CITrain pre-training (pyscf-free) ----
    from pynqs_tpu.ci import CITrain, CITrainConfig, cisd_space, solve_ci

    e_sd, ci_sd = solve_ci(
        cisd_space(sys_.sorb, sys_.noa, sys_.nob), sys_.tables,
        ecore=sys_.ecore,
    )
    print(f"native CISD:  {e_sd:.6f} Ha ({1000 * (e_sd - e0):+.2f} mHa)")
    model = GraphMPSRNN(sys_.sorb, sys_.noa, sys_.nob, dcut=10)
    pre = CITrain(
        model, ci_sd.select(1e-6),
        CITrainConfig(n_iter=200, lr=2e-2, loss="overlap", log_every=100),
    )
    params, _ = pre.run(jax.random.PRNGKey(4))
    print(f"CITrain:      |<psi|CISD>|^2 = {pre.overlap(params):.4f}")

    # ---- 3. VMC: DFS prefix-partitioned AR sampling + REDUCE eloc ----
    sampler = ARSampler(
        sys_.sorb, sys_.noa, sys_.nob,
        n_sample=50_000, capacity=128,
        dfs_n_group=2, dfs_split_depth=3, dfs_capacity_root=64,
    )
    vmc = VMC(
        model, sys_, sampler,
        VMCConfig(
            n_iter=150, optimizer=optax.adam(2e-2), eloc_method="reduce",
            eloc_k_det=24, eloc_n_stoch=8, log_every=50,
        ),
    )
    params, hist = vmc.run(jax.random.PRNGKey(0), params=params)
    print(f"VMC (Adam):   {np.mean(hist[-10:]):.6f} Ha "
          f"({1000 * (np.mean(hist[-10:]) - e0):+.2f} mHa)")

    # ---- 4. CG min-SR refinement ----
    vmc_sr = VMC(
        model, sys_, sampler,
        VMCConfig(
            n_iter=100, optimizer=optax.sgd(5e-2), use_sr=True,
            sr_solver="cg", sr_n_cg=100, sr_damping=1e-3,
            eloc_method="reduce", eloc_k_det=24, eloc_n_stoch=8,
            log_every=50,
        ),
    )
    params, hist = vmc_sr.run(jax.random.PRNGKey(1), params=params)
    print(f"VMC (CG-SR):  {np.mean(hist[-10:]):.6f} Ha "
          f"({1000 * (np.mean(hist[-10:]) - e0):+.2f} mHa)")

    # ---- 5. RESTRICTED deterministic optimization on a det subset ----
    lp = model.log_psi(params, jnp.asarray(space))
    top = np.argsort(-np.asarray(lp[:, 0]))[:64]
    rsamp = RestrictedSampler(
        sys_.sorb, sys_.noa, sys_.nob, states=space[top]
    )
    vmc_r = VMC(
        model, sys_, rsamp,
        VMCConfig(n_iter=50, optimizer=optax.adam(5e-3), log_every=50),
    )
    params, hist = vmc_r.run(jax.random.PRNGKey(2), params=params)
    print(f"RESTRICTED:   {hist[-1]:.6f} Ha (64-det support)")

    # ---- 6. fixed-node GFMC with the trained-NQS-derived CI trial ----
    lp = np.asarray(model.log_psi(params, jnp.asarray(space)))
    c = np.exp(lp[:, 0]) * np.cos(lp[:, 1])
    trial = ci_trial_log_psi(CIWavefunction(jnp.asarray(c), space))
    walkers = np.repeat(space, 4, axis=0)[:256]
    out = GFMC(
        trial, sys_,
        GFMCConfig(n_iter=80, p_steps=6, branch_interval=10,
                   dedup_unique_max=256),
    ).run(walkers, jax.random.PRNGKey(3))
    from pynqs_tpu.gfmc.walker import mixed_energy

    e_g = mixed_energy(out, 6, tail=20)[0]
    print(f"GFMC (p=6):   {e_g:.6f} Ha ({1000 * (e_g - e0):+.2f} mHa)")


if __name__ == "__main__":
    main()
