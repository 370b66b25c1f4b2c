"""Hybrid CI-NQS: eigenvalue sanity + improvement over both parts."""

import numpy as np
import jax
import pytest

import oracle
from pynqs_tpu.ci.nqs_ci import NqsCi, NqsCiConfig
from pynqs_tpu.models.rnn import RNNWavefunction
from pynqs_tpu.utils import System, fci
from pynqs_tpu.ops.integrals import decompress_h2e


@pytest.mark.slow
def test_nqs_ci_energy_below_ci_alone():
    sys = System.hubbard_1d(4, 2, 2, u=4.0)
    dets = oracle.fci_space(sys.sorb, sys.noa, sys.nob)
    H = oracle.dense_h(dets, sys.h1e, decompress_h2e(sys.h2e, sys.sorb))
    w, v = np.linalg.eigh(H)
    e0 = w[0]
    space = fci.fci_bits(sys.sorb, sys.noa, sys.nob)

    # CI set: the 6 most important determinants of the ground state
    order = np.argsort(-np.abs(v[:, 0]))[:6]
    d_bits = space[np.sort(order)]
    # CI-only variational energy (exact diag restricted to D)
    h_dd = H[np.ix_(np.sort(order), np.sort(order))]
    e_ci_only = np.linalg.eigvalsh(h_dd)[0]

    model = RNNWavefunction(sys.sorb, sys.noa, sys.nob, hidden=16, phase_hidden=8)
    nc = NqsCi(
        model, sys, d_bits,
        NqsCiConfig(n_iter=300, lr=5e-3, n_sample=1 << 13, capacity=len(dets)),
    )
    params, c, hist = nc.run(jax.random.PRNGKey(0))
    e_late = float(np.mean(hist[-20:]))

    # sanity: above FCI (variational up to MC noise), below CI-only
    assert e_late > e0 - 5e-3
    assert e_late < e_ci_only - 1e-3, (e_late, e_ci_only, e0)
    # eigenvector normalized, NQS weight is nonzero
    assert abs(np.linalg.norm(c) - 1) < 1e-8
    assert abs(c[-1]) > 0.05
