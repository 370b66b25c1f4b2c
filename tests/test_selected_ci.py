"""In-repo heat-bath selected CI (ci/selected.py): FCI convergence as
eps1 -> 0, variational hierarchy in eps1, and the Epstein-Nesbet PT2
correction — the framework-native replacement for the reference's
external DICE/SHCI runner (utils/pyscf_helper/dice_pyscf.py:22)."""

import numpy as np

import oracle
from pynqs_tpu.ci.selected import en_pt2, selected_ci
from pynqs_tpu.ops.integrals import decompress_h2e
from pynqs_tpu.utils import System, fci


def _fci_energy(sys):
    dets = oracle.fci_space(sys.sorb, sys.noa, sys.nob)
    H = oracle.dense_h(dets, sys.h1e, decompress_h2e(sys.h2e, sys.sorb))
    return np.linalg.eigvalsh(H)[0] + sys.ecore


def test_selected_ci_converges_to_fci():
    sys = System.hubbard_1d(4, 2, 2, u=4.0)
    e_fci = _fci_energy(sys)
    e, ci, info = selected_ci(sys, eps1=1e-12, max_rounds=30)
    assert abs(e - e_fci) < 1e-6, (e, e_fci)
    # the HF-seeded growth reaches the full (connected) FCI space
    assert info["space_sizes"][-1] == len(fci.fci_bits(sys.sorb, 2, 2))


def test_selected_ci_variational_hierarchy():
    sys = System.hubbard_1d(6, 2, 2, u=4.0)
    e_fci = _fci_energy(sys)
    e_loose, ci_l, info_l = selected_ci(sys, eps1=0.2, max_rounds=10)
    e_tight, ci_t, info_t = selected_ci(sys, eps1=0.02, max_rounds=10)
    assert e_fci - 1e-9 <= e_tight <= e_loose + 1e-9, (e_fci, e_tight, e_loose)
    assert ci_t.bits.shape[0] >= ci_l.bits.shape[0]
    # energies in the history are monotone non-increasing (growing spaces)
    h = info_t["e_history"]
    assert all(h[i + 1] <= h[i] + 1e-10 for i in range(len(h) - 1))


def test_en_pt2_improves_toward_fci():
    sys = System.hubbard_1d(6, 2, 2, u=4.0)
    e_fci = _fci_energy(sys)
    e_var, ci, info = selected_ci(sys, eps1=0.1, eps2=1e-12, max_rounds=6)
    de2 = info["e_pt2"]
    assert de2 <= 0.0
    # PT2 moves the estimate toward FCI (standard SHCI behavior on a
    # small gapped system)
    assert abs((e_var + de2) - e_fci) < abs(e_var - e_fci)
    # recomputing through the public helper matches
    de2_b = en_pt2(sys, ci, e_var, eps2=1e-12)
    assert abs(de2 - de2_b) < 1e-10


def test_selected_ci_max_space_cap():
    sys = System.hubbard_1d(6, 2, 2, u=4.0)
    e_cap, ci_cap, _ = selected_ci(sys, eps1=1e-12, max_rounds=4, max_space=20)
    assert ci_cap.bits.shape[0] <= 20
    e_free, _, _ = selected_ci(sys, eps1=1e-12, max_rounds=4)
    assert e_free <= e_cap + 1e-9
