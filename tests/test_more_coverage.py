"""Extra coverage: FCIDUMP parsing, spin-projected VMC, sharded GFMC."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import oracle
from pynqs_tpu.utils import System, fci


def test_fcidump_roundtrip(tmp_path):
    """Hand-written FCIDUMP == from_spatial on the same integrals."""
    rng = np.random.default_rng(0)
    norb = 3
    hcore = rng.standard_normal((norb, norb))
    hcore = (hcore + hcore.T) / 2
    # chemist ERI with full 8-fold symmetry
    eri = rng.standard_normal((norb,) * 4)
    eri = eri + eri.transpose(1, 0, 2, 3)
    eri = eri + eri.transpose(0, 1, 3, 2)
    eri = eri + eri.transpose(2, 3, 0, 1)
    ecore = 0.731

    lines = [" &FCI NORB=3,NELEC=4,MS2=0,", "  ORBSYM=1,1,1,", "  ISYM=1,", " &END"]
    seen = set()
    for i in range(norb):
        for j in range(i + 1):
            for k in range(norb):
                for l in range(k + 1):
                    if (i, j) < (k, l):
                        continue
                    key = (i, j, k, l)
                    if key in seen:
                        continue
                    seen.add(key)
                    lines.append(
                        f" {eri[i, j, k, l]:.16e} {i+1} {j+1} {k+1} {l+1}"
                    )
    for i in range(norb):
        for j in range(i + 1):
            lines.append(f" {hcore[i, j]:.16e} {i+1} {j+1} 0 0")
    lines.append(f" {ecore:.16e} 0 0 0 0")
    path = str(tmp_path / "FCIDUMP")
    open(path, "w").write("\n".join(lines))

    sys_f = System.from_fcidump(path)
    sys_s = System.from_spatial(hcore, eri, 2, 2, ecore)
    assert sys_f.noa == 2 and sys_f.nob == 2
    np.testing.assert_allclose(sys_f.h1e, sys_s.h1e, atol=1e-12)
    np.testing.assert_allclose(sys_f.h2e, sys_s.h2e, atol=1e-12)
    assert abs(sys_f.ecore - ecore) < 1e-12


@pytest.mark.slow
def test_spin_projected_vmc_improves_symmetry():
    """P̂η projection: ⟨S⁻S⁺⟩ of the projected state stays small while
    the energy optimizes (singlet ground state)."""
    import optax

    from pynqs_tpu.models.extra import SpinProjected
    from pynqs_tpu.models.rnn import RNNWavefunction
    from pynqs_tpu.optim.vmc import VMC, VMCConfig
    from pynqs_tpu.sampler import ARSampler
    from pynqs_tpu.ops.integrals import decompress_h2e, spin_raising

    sys = System.hubbard_1d(4, 2, 2, u=4.0)
    dets = oracle.fci_space(sys.sorb, sys.noa, sys.nob)
    H = oracle.dense_h(dets, sys.h1e, decompress_h2e(sys.h2e, sys.sorb))
    e0 = np.linalg.eigvalsh(H)[0]

    base = RNNWavefunction(sys.sorb, sys.noa, sys.nob, hidden=16, phase_hidden=16)
    model = SpinProjected(base, eta=1)  # singlet: eta=(-1)^(N/2-S)=+1
    sampler = ARSampler(sys.sorb, sys.noa, sys.nob, n_sample=1 << 13, capacity=36)
    vmc = VMC(
        model, sys, sampler,
        VMCConfig(
            n_iter=600, use_sr=True, sr_damping=1e-2,
            optimizer=optax.sgd(5e-2), log_every=10**6,
        ),
    )
    params, hist = vmc.run(jax.random.PRNGKey(2))
    err = abs(np.mean(hist[-20:]) - e0) * 1000
    assert err < 5.0, f"projected VMC error {err:.2f} mHa"

    # spin contamination of the projected state is tiny
    ssp = vmc.operator_expected(
        params, spin_raising(sys.sorb), jax.random.PRNGKey(3)
    )
    assert ssp.mean.real < 0.2, ssp


def test_gfmc_runs_under_mesh():
    """GFMC iteration executes with walkers sharded over 8 devices."""
    from pynqs_tpu.ci import CIWavefunction
    from pynqs_tpu.gfmc import GFMC, GFMCConfig
    from pynqs_tpu.gfmc.walker import ci_trial_log_psi
    from pynqs_tpu.ops.integrals import decompress_h2e
    from pynqs_tpu.parallel.mesh import batch_sharding, make_mesh

    sys = System.hubbard_1d(3, 2, 1, u=4.0)
    dets = oracle.fci_space(sys.sorb, sys.noa, sys.nob)
    H = oracle.dense_h(dets, sys.h1e, decompress_h2e(sys.h2e, sys.sorb))
    w, v = np.linalg.eigh(H)
    space = fci.fci_bits(sys.sorb, sys.noa, sys.nob)
    ci = CIWavefunction(coeffs=v[:, 0], bits=space)
    trial = ci_trial_log_psi(ci)

    mesh = make_mesh(8)
    g = GFMC(trial, sys, GFMCConfig(n_walkers=64, n_iter=6, p_steps=2))
    from pynqs_tpu.ops import onv

    hf = onv.hf_bits(sys.sorb, sys.noa, sys.nob)
    walkers = jnp.asarray(np.broadcast_to(hf, (64, sys.sorb)))
    with mesh:
        walkers = jax.device_put(walkers, batch_sharding(mesh))
        out = g.run(walkers, key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(out["e_gen"], w[0], atol=1e-8)


def test_er_localization_invariant_energy_and_increases_self_repulsion():
    """localize_er (the pyscf-free analog of the reference's
    localized_orb pipeline step): the ER functional strictly
    increases, U is orthogonal, and the FCI ground energy of the
    System built from the localized pair is invariant."""
    import numpy as np

    from pynqs_tpu.utils import System
    from pynqs_tpu.utils.orbitals import localize_er

    rng = np.random.default_rng(5)
    n = 4
    hcore = rng.standard_normal((n, n)) * 0.3
    hcore = (hcore + hcore.T) / 2
    # build a PSD-symmetric chemist ERI: (pq|rs) from random 3-index
    L = rng.standard_normal((7, n, n)) * 0.3
    L = (L + np.transpose(L, (0, 2, 1))) / 2
    eri = np.einsum("xpq,xrs->pqrs", L, L)

    def sr(e):
        return float(np.einsum("iiii->i", e).sum())

    h_loc, eri_loc, U = localize_er(hcore, eri, n_iter=200)
    assert np.allclose(U.T @ U, np.eye(n), atol=1e-10)
    assert sr(eri_loc) > sr(eri) + 1e-6, (sr(eri_loc), sr(eri))

    def e0(h, e):
        sys = System.from_spatial(h, e, 2, 2)
        from pynqs_tpu.utils import fci as fci_mod
        import jax.numpy as jnp
        from pynqs_tpu.ops.hamiltonian import hij_dense

        space = jnp.asarray(fci_mod.fci_bits(sys.sorb, 2, 2))
        H = np.asarray(hij_dense(space, space, *sys.tables.astuple()))
        return np.linalg.eigvalsh(H)[0]

    assert abs(e0(hcore, eri) - e0(h_loc, eri_loc)) < 1e-9
