"""Native selected-space CI: space enumeration + Davidson solver + IO.

The reference starts its pre-train → VMC → CI-NQS ladder from a pyscf
UCISD vector (utils/ci/interface_pyscf.py:13-144 `unpack_ucisd` /
`ucisd_to_fci`).  pyscf is an external dependency; the TPU rebuild
instead computes the CISD (or any selected-space) ground state
IN-REPO from the integral tables:

  * :func:`cisd_space` — HF + all singles/doubles from the static
    excitation slot table (exactly the UCISD determinant set),
  * :func:`solve_ci` — Davidson on the selected space with chunked
    Slater–Condon matvecs (ops/hamiltonian.hij_dense on device),
  * :func:`save_ci` / :func:`load_ci` — a plain .npz determinant-
    coefficient format so ANY external tool (pyscf, DICE/SHCI, DMRG)
    can hand states across without bespoke unpackers.

This also covers the reference's SHCI-runner gap the honest way: DICE
writes (coeff, determinant) pairs; converting them to this .npz is a
five-line script on the machine that has the binary.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pynqs_tpu.ci.wavefunction import CIWavefunction

__all__ = ["cisd_space", "solve_ci", "davidson", "save_ci", "load_ci"]


def cisd_space(sorb: int, noa: int, nob: int) -> np.ndarray:
    """[1 + n_sd, sorb] int8: HF + every single/double excitation —
    the UCISD determinant set (reference interface_pyscf.py:13-95
    builds the same set by quadruple loops)."""
    from pynqs_tpu.ops import onv as _onv
    from pynqs_tpu.ops.excitation import excitation_table, make_comb_bits

    table = excitation_table(sorb, noa, nob)
    hf = jnp.asarray(_onv.hf_bits(sorb, noa, nob))[None, :]
    merged = _onv.merged_orbital_list(hf, noa, nob)
    orbs = jnp.take(merged, jnp.asarray(table.pos), axis=-1)  # [1, n_sd, 4]
    is_double = jnp.arange(table.n_sd) >= table.n_singles
    comb = make_comb_bits(hf, orbs, is_double)[0]  # [n_sd, sorb]
    return np.concatenate(
        [np.asarray(hf, np.int8), np.asarray(comb, np.int8)], axis=0
    )


def davidson(
    matvec,
    diag: np.ndarray,
    dim: int,
    *,
    v0: np.ndarray | None = None,
    tol: float = 1e-9,
    max_iter: int = 200,
    max_subspace: int = 40,
):
    """Lowest eigenpair of a symmetric operator by Davidson iteration
    (diagonal-preconditioned, thick restart).  numpy host driver; the
    matvec is the only heavy op and runs on device."""
    rng = np.random.default_rng(0)
    if v0 is None:
        v0 = np.zeros(dim)
        v0[int(np.argmin(diag))] = 1.0
    V = v0[:, None] / np.linalg.norm(v0)
    AV = matvec(V[:, 0])[:, None]
    theta, y = np.inf, None
    for _ in range(max_iter):
        T = V.T @ AV
        T = 0.5 * (T + T.T)
        evals, evecs = np.linalg.eigh(T)
        theta_new, y = evals[0], evecs[:, 0]
        x = V @ y
        r = AV @ y - theta_new * x
        rnorm = np.linalg.norm(r)
        conv = abs(theta_new - theta) < tol and rnorm < max(tol * 100, 1e-6)
        theta = theta_new
        if conv or V.shape[1] >= dim:  # full subspace -> T eigh is exact
            return theta, x
        # diagonal preconditioner; guard near-zero denominators
        denom = diag - theta
        denom = np.where(np.abs(denom) < 1e-8, 1e-8, denom)
        t = r / denom
        # orthogonalize against V (twice, for stability)
        for _ in range(2):
            t -= V @ (V.T @ t)
        tn = np.linalg.norm(t)
        if tn < 1e-12:
            t = rng.standard_normal(dim)
            t -= V @ (V.T @ t)
            tn = np.linalg.norm(t)
        t /= tn
        if V.shape[1] >= max_subspace:  # thick restart from the Ritz vector
            V = x[:, None]
            AV = matvec(x)[:, None]
            V /= np.linalg.norm(V[:, 0])
        V = np.concatenate([V, t[:, None]], axis=1)
        AV = np.concatenate([AV, matvec(t)[:, None]], axis=1)
    return theta, V @ y


def solve_ci(
    space_bits: np.ndarray,
    tables,
    *,
    ecore: float = 0.0,
    chunk: int = 1024,
    cache_max: int = 8192,
    tol: float = 1e-9,
    max_iter: int = 200,
) -> tuple[float, CIWavefunction]:
    """Ground state of H restricted to ``space_bits`` [m, sorb].

    Returns (energy incl. ecore, CIWavefunction).  For m ≤ cache_max
    the dense H block is built once (chunked) and matvecs are host
    GEMVs; above that every Davidson matvec recomputes Slater–Condon
    chunks on device (memory O(chunk·m)).
    """
    from pynqs_tpu.ops.hamiltonian import hij_dense, hij_diagonal

    ops = tables.astuple() if hasattr(tables, "astuple") else tables
    h1e, h2e, diag1, K, J = ops
    m = space_bits.shape[0]
    bits_d = jnp.asarray(space_bits)
    diag = np.asarray(hij_diagonal(bits_d, diag1, K), np.float64)

    if m <= cache_max:
        H = np.empty((m, m), np.float64)
        for s in range(0, m, chunk):
            H[s : s + chunk] = np.asarray(
                hij_dense(bits_d[s : s + chunk], bits_d, *ops), np.float64
            )
        H = 0.5 * (H + H.T)  # symmetrize f32 Slater–Condon roundoff
        if m <= 1024:  # dense eigh beats Davidson outright at this size
            w, v = np.linalg.eigh(H)
            c = v[:, 0]
            if c[np.argmax(np.abs(c))] < 0:
                c = -c
            return float(w[0] + ecore), CIWavefunction(coeffs=c, bits=space_bits)

        def matvec(v):
            return H @ v

    else:

        def matvec(v):
            vd = jnp.asarray(v, jnp.float64)
            out = np.empty(m, np.float64)
            for s in range(0, m, chunk):
                blk = hij_dense(bits_d[s : s + chunk], bits_d, *ops)
                out[s : s + chunk] = np.asarray(
                    blk.astype(jnp.float64) @ vd, np.float64
                )
            return out

    e, c = davidson(matvec, diag, m, tol=tol, max_iter=max_iter)
    if c[np.argmax(np.abs(c))] < 0:  # sign convention: largest coeff > 0
        c = -c
    return float(e + ecore), CIWavefunction(coeffs=c, bits=space_bits)


def save_ci(path: str, ci: CIWavefunction, **meta):
    """Determinant-coefficient .npz: coeffs [m] f64, bits [m, sorb]
    int8, plus arbitrary scalar metadata (e.g. energy, sorb, nele)."""
    np.savez_compressed(
        path,
        coeffs=np.asarray(ci.coeffs, np.float64),
        bits=np.asarray(ci.bits, np.int8),
        **meta,
    )


def load_ci(path: str) -> tuple[CIWavefunction, dict]:
    """Read a determinant-coefficient .npz → (CIWavefunction, meta)."""
    with np.load(path) as z:
        ci = CIWavefunction(coeffs=z["coeffs"], bits=z["bits"])
        meta = {
            k: z[k][()] if z[k].ndim == 0 else z[k]
            for k in z.files
            if k not in ("coeffs", "bits")
        }
    return ci, meta
