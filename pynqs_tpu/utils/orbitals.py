"""Host-side spatial-orbital transformations (no pyscf required).

Reference: utils/pyscf_helper/interface_pyscf.py folds frozen-core
contributions inside its pyscf pipeline; here the fold is a pure
integral transformation so it is testable in-repo (FCI restricted to
core-doubly-occupied determinants == frozen-core FCI of the reduced
system — tests/test_ci_solve.py) and usable on integrals from ANY
source (FCIDUMP, .pth, generated).
"""

from __future__ import annotations

import numpy as np

__all__ = ["freeze_core"]


def freeze_core(
    h1: np.ndarray, eri: np.ndarray, ecore: float, n_frozen: int
) -> tuple[np.ndarray, np.ndarray, float]:
    """Fold ``n_frozen`` doubly-occupied lowest spatial orbitals into
    the core.

    h1 [n, n] spatial one-electron MO integrals; eri [n, n, n, n]
    chemist-notation (pq|rs).  Returns (h1_act, eri_act, ecore_act)
    over the remaining n - n_frozen orbitals:

        E_core = ecore + 2 Σ_i h_ii + Σ_ij [2 (ii|jj) − (ij|ji)]
        h'_pq  = h_pq + Σ_i [2 (pq|ii) − (pi|iq)]
    """
    nf = n_frozen
    if nf == 0:
        return h1, eri, ecore
    f = slice(0, nf)
    a = slice(nf, h1.shape[0])
    e = (
        float(ecore)
        + 2.0 * float(np.trace(h1[f, f]))
        + 2.0 * float(np.einsum("iijj->", eri[f, f, f, f]))
        - float(np.einsum("ijji->", eri[f, f, f, f]))
    )
    h1_act = (
        h1[a, a]
        + 2.0 * np.einsum("pqii->pq", eri[a, a, f, f])
        - np.einsum("piiq->pq", eri[a, f, f, a])
    )
    return h1_act, eri[a, a, a, a].copy(), e
