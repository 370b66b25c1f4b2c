"""GFMC fixed-node projection + CI pre-training + CI energy."""

import numpy as np
import jax
import pytest
import jax.numpy as jnp

import oracle
from pynqs_tpu.ci import CITrain, CITrainConfig, CIWavefunction
from pynqs_tpu.gfmc import GFMC, GFMCConfig
from pynqs_tpu.gfmc.walker import ci_trial_log_psi
from pynqs_tpu.models.rnn import RNNWavefunction
from pynqs_tpu.utils import System, fci
from pynqs_tpu.ops.integrals import decompress_h2e


def _system_and_fci(nsites=4, noa=2, nob=2, u=4.0):
    sys = System.hubbard_1d(nsites, noa, nob, u=u)
    dets = oracle.fci_space(sys.sorb, noa, nob)
    H = oracle.dense_h(dets, sys.h1e, decompress_h2e(sys.h2e, sys.sorb))
    w, v = np.linalg.eigh(H)
    space = fci.fci_bits(sys.sorb, noa, nob)
    return sys, space, w, v


def test_ci_energy_matches_dense():
    sys, space, w, v = _system_and_fci()
    ci = CIWavefunction(coeffs=v[:, 0], bits=space)
    e = ci.energy(sys.tables, chunk=7)
    np.testing.assert_allclose(e, w[0], atol=1e-10)


def test_gfmc_exact_trial_gives_exact_energy():
    sys, space, w, v = _system_and_fci()
    ci = CIWavefunction(coeffs=v[:, 0], bits=space)
    trial = ci_trial_log_psi(ci)
    g = GFMC(trial, sys, GFMCConfig(n_walkers=64, n_iter=10, p_steps=3))
    # start walkers at HF
    from pynqs_tpu.ops import onv

    hf = onv.hf_bits(sys.sorb, sys.noa, sys.nob)
    walkers = np.broadcast_to(hf, (64, sys.sorb))
    out = g.run(walkers, key=jax.random.PRNGKey(0))
    # with the exact trial, e_loc ≡ E0 so every estimator equals E0
    np.testing.assert_allclose(out["energy"], w[0], atol=1e-8)


@pytest.mark.slow
def test_gfmc_improves_imperfect_trial():
    sys, space, w, v = _system_and_fci()
    # perturbed trial: mix ground state with 1st excited state
    rng = np.random.default_rng(0)
    c = v[:, 0] + 0.15 * v[:, 1] + 0.1 * v[:, 2]
    c /= np.linalg.norm(c)
    ci = CIWavefunction(coeffs=c, bits=space)
    e_var = ci.energy(sys.tables)
    trial = ci_trial_log_psi(ci)
    g = GFMC(
        trial, sys,
        GFMCConfig(n_walkers=512, n_iter=120, p_steps=8, branch_interval=10),
    )
    from pynqs_tpu.ops import onv

    hf = onv.hf_bits(sys.sorb, sys.noa, sys.nob)
    walkers = np.broadcast_to(hf, (512, sys.sorb))
    out = g.run(walkers, key=jax.random.PRNGKey(1))
    e_late = out["energy"][60:, :]  # after equilibration
    e_p0 = e_late[:, 0].mean()  # mixed estimator, no projection
    e_p8 = e_late[:, -1].mean()  # deepest projection
    assert e_var > w[0] + 1e-4  # trial is not exact
    # projection should move the energy toward E0 vs the p=0 estimator
    assert e_p8 < e_p0 + 1e-9
    assert abs(e_p8 - w[0]) < abs(e_var - w[0]), (e_p8, e_var, w[0])


@pytest.mark.slow
def test_ci_pretraining_overlap_and_sample_losses():
    sys, space, w, v = _system_and_fci()
    ci = CIWavefunction(coeffs=v[:, 0], bits=space)
    model = RNNWavefunction(sys.sorb, sys.noa, sys.nob, hidden=24, phase_hidden=16)

    tr = CITrain(model, ci, CITrainConfig(n_iter=1000, lr=2e-2, loss="overlap"))
    params, hist = tr.run(jax.random.PRNGKey(0))
    ov = tr.overlap(params)
    assert ov > 0.98, f"overlap after onstate pre-training {ov}"

    # warm start the sample-based loss from the overlap fit
    tr2 = CITrain(
        model, ci,
        CITrainConfig(
            n_iter=100, lr=1e-3, loss="sample",
            n_sample=1 << 12, capacity=space.shape[0],
        ),
    )
    params2, hist2 = tr2.run(jax.random.PRNGKey(1), params=params)
    ov2 = tr2.overlap(params2)
    assert ov2 > 0.99, f"overlap after sample pre-training {ov2}"
