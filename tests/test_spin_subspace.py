"""S-restricted operator matvec via the SAMPLE_SPACE kernel
(scripts/spin_subspace_eval.py scheme) vs the dense oracle.

The matvec evaluates y = O_S u for a vector u supported on a PARTIAL
determinant set S, using a unit reference amplitude (no division by
u(x) — safe for projected vectors with zeros) and re-adding the
diagonal analytically.
"""

import numpy as np
import jax
import jax.numpy as jnp

from pynqs_tpu.energy.eloc import local_energy_sample_space
from pynqs_tpu.ops.hamiltonian import hij_diagonal
from pynqs_tpu.ops.lut import WavefunctionLUT
from pynqs_tpu.ops import integrals
from pynqs_tpu.utils import System
from tests import oracle


def _restricted_matvec(bits, ops, hpair, table, u):
    U = bits.shape[0]

    def pair_of(un):
        mag = np.abs(un)
        return jnp.asarray(
            np.stack([np.log(np.maximum(mag, 1e-280)), np.angle(un)], -1)
        )

    ones_pair = jnp.zeros((U, 2), jnp.float64)
    diag = np.asarray(hij_diagonal(bits, ops[2], ops[3]))
    scale = np.abs(u).max()
    un = u / scale
    lut = WavefunctionLUT.build(bits, pair_of(un))
    el = np.asarray(
        local_energy_sample_space(
            bits, ones_pair, lut, ops, table, batch=32, hpair=hpair
        )
    )
    return scale * (((el[:, 0] - diag) + 1j * el[:, 1]) + diag * un)


def test_restricted_matvec_matches_dense_oracle():
    sys_ = System.hubbard_1d(6, 2, 2, u=4.0)
    dets = oracle.fci_space(sys_.sorb, sys_.noa, sys_.nob)
    Hd = oracle.dense_h(
        dets, np.asarray(sys_.h1e),
        integrals.decompress_h2e(np.asarray(sys_.h2e), sys_.sorb),
    )
    bits_all = np.array(
        [[(d >> p) & 1 for p in range(sys_.sorb)] for d in dets], np.int8
    )
    U = len(dets)
    keep = np.ones(U, bool)
    keep[::7] = False  # partial captured set
    bits = jnp.asarray(bits_all[keep])
    Hd = Hd[np.ix_(keep, keep)]
    U = int(keep.sum())
    ops = tuple(
        jnp.asarray(np.asarray(x), jnp.float64) for x in sys_.tables.astuple()
    )
    rng = np.random.default_rng(0)
    u = rng.standard_normal(U) + 1j * rng.standard_normal(U)
    u[3] = 0.0  # zero-amplitude entry must not blow up
    y = _restricted_matvec(bits, ops, None, sys_.excitation, u)
    np.testing.assert_allclose(y, Hd @ u, rtol=0, atol=1e-12)


def test_spin_krylov_removes_contamination():
    """A hand-mixed S=0/S=2 state on the Sz=0 sector: the optimum in
    span{v, S²v, (S²)²v} recovers the pure-singlet energy."""
    from scipy.linalg import eigh

    sorb, noa, nob = 8, 2, 2
    sys_ = System.hubbard_1d(sorb // 2, noa, nob, u=4.0)  # 4 sites -> sorb 8
    dets = oracle.fci_space(sorb, noa, nob)
    h2d = integrals.decompress_h2e(np.asarray(sys_.h2e), sorb)
    Hd = oracle.dense_h(dets, np.asarray(sys_.h1e), h2d)
    h1s, h2s = integrals.spin_raising(sorb)
    Sd = oracle.dense_h(dets, h1s, integrals.decompress_h2e(h2s, sorb))
    # spin eigenbasis
    ws, cs = np.linalg.eigh(Sd)
    wh, ch = np.linalg.eigh(Hd)
    # lowest H eigenvector in the S=0 sector vs a contaminated mix
    P0 = cs[:, np.abs(ws) < 1e-8]
    H0 = P0.T @ Hd @ P0
    w0, c0 = np.linalg.eigh(H0)
    v0 = P0 @ c0[:, 0]  # pure singlet ground state
    P2 = cs[:, np.abs(ws - 6.0) < 1e-8]
    H2 = P2.T @ Hd @ P2
    w2, c2 = np.linalg.eigh(H2)
    v2 = P2 @ c2[:, 0]
    v = 0.8 * v0 + 0.6 * v2  # contaminated: <S-S+> = 0.36*6 = 2.16
    b0, b1, b2 = v, Sd @ v, Sd @ (Sd @ v)
    B = np.stack([b0, b1, b2], 1)
    A = B.T @ Hd @ B
    M = B.T @ B
    w, c = eigh((A + A.T) / 2, (M + M.T) / 2)
    e_opt = w[0]
    assert abs(e_opt - w0[0]) < 1e-9  # recovers the pure-singlet energy
    assert e_opt < v @ Hd @ v / (v @ v) - 0.01  # strictly below the mix
