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

__all__ = ["freeze_core", "localize_er"]


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


def localize_er(
    hcore: np.ndarray,
    eri: np.ndarray,
    n_iter: int = 400,
    lr: float = 0.1,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Edmiston–Ruedenberg orbital localization on spatial integrals.

    The reference's ``localized_orb`` option replaces the MO basis with
    pyscf's Löwdin-orthogonalized AOs
    (utils/pyscf_helper/interface_pyscf.py:226-234) — an AO-level
    operation this environment cannot reproduce without pyscf.  This is
    the in-basis analog usable on integrals from ANY source: maximize
    the ER self-repulsion functional  L(U) = Σ_i (ii|ii)  over
    orthogonal U by Riemannian ascent (U = expm(A−Aᵀ), AD through the
    matrix exponential — compiler-friendly, no Jacobi sweeps), then
    transform (hcore, eri).  Localized orbitals concentrate exchange
    onto near neighbours, which is what the MPS/MPS-RNN orbital-ordering
    graphs (utils/graph.py) feed on.

    Args: hcore [n, n], eri [n, n, n, n] chemist convention (pq|rs).
    Returns (hcore_loc, eri_loc, U) with columns of U the localized
    orbitals; energies of any System built from the pair are invariant.
    """
    import jax
    import jax.numpy as jnp

    n = hcore.shape[0]
    eri_j = jnp.asarray(eri, jnp.float64)
    tri = np.tril_indices(n, -1)

    def unitary(a_vec):
        A = jnp.zeros((n, n), jnp.float64).at[tri].set(a_vec)
        return jax.scipy.linalg.expm(A - A.T)

    def self_repulsion(u):
        t = jnp.einsum("pqrs,si->pqri", eri_j, u)
        t = jnp.einsum("pqri,ri->pqi", t, u)
        t = jnp.einsum("pqi,qi->pi", t, u)
        return jnp.einsum("pi,pi->i", t, u)

    loss = jax.jit(lambda a: -self_repulsion(unitary(a)).sum())
    gfn = jax.jit(jax.grad(lambda a: -self_repulsion(unitary(a)).sum()))

    rng = np.random.default_rng(seed)
    a = jnp.asarray(rng.standard_normal(tri[0].size) * 1e-3)
    # plain gradient ascent with backtracking (the objective is smooth
    # and bounded; Adam's momentum overshoots the compact manifold)
    step = lr
    best = float(loss(a))
    for _ in range(n_iter):
        g = gfn(a)
        cand = a - step * g
        c = float(loss(cand))
        if c < best:
            a, best = cand, c
            step = min(step * 1.2, 1.0)
        else:
            step *= 0.5
            if step < 1e-8:
                break
    U = np.asarray(unitary(a))
    h_loc = U.T @ np.asarray(hcore, np.float64) @ U
    eri_loc = np.asarray(
        jnp.einsum(
            "pqrs,pa,qb,rc,sd->abcd",
            eri_j,
            jnp.asarray(U), jnp.asarray(U), jnp.asarray(U), jnp.asarray(U),
        )
    )
    return h_loc, eri_loc, U
