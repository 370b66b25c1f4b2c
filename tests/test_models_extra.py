"""Jastrow/DBM/IsingRBM/ARRBM/Hybrid/MultiPsi/SpinProjected models."""

import numpy as np
import jax
import jax.numpy as jnp

import oracle
from pynqs_tpu.models.ar_rbm import ARRBM
from pynqs_tpu.models.extra import (
    DBM,
    HybridWavefunction,
    IsingRBM,
    Jastrow,
    MultiPsi,
    SpinProjected,
)
from pynqs_tpu.models.rnn import RNNWavefunction
from pynqs_tpu.optim.vmc import VMC, VMCConfig
from pynqs_tpu.sampler import ARSampler, ExactSampler, ar_sampling
from pynqs_tpu.utils import System, fci
from pynqs_tpu.ops import onv
from pynqs_tpu.ops.integrals import decompress_h2e


def _sys_e0(nsites=3, noa=2, nob=1, u=4.0):
    sys = System.hubbard_1d(nsites, noa, nob, u=u)
    dets = oracle.fci_space(sys.sorb, noa, nob)
    H = oracle.dense_h(dets, sys.h1e, decompress_h2e(sys.h2e, sys.sorb))
    return sys, np.linalg.eigvalsh(H)[0], len(dets)


def test_simple_models_forward_shapes():
    sorb = 8
    space = jnp.asarray(fci.fci_bits(sorb, 2, 2))
    for model in (Jastrow(sorb), DBM(sorb), IsingRBM(sorb)):
        params = model.init(jax.random.PRNGKey(0))
        lp = model.log_psi(params, space)
        assert lp.shape == (space.shape[0], 2)
        assert bool(jnp.isfinite(lp).all())


def test_arrbm_normalized_and_sampling():
    sorb, noa, nob = 8, 2, 2
    model = ARRBM(sorb, noa, nob, nh=16, phase_hidden=8)
    params = model.init(jax.random.PRNGKey(0))
    space = fci.fci_bits(sorb, noa, nob)
    lp = model.log_psi(params, jnp.asarray(space))
    p = np.exp(2 * np.asarray(lp[..., 0]))
    assert abs(p.sum() - 1.0) < 1e-9
    bits, counts, dropped = ar_sampling(
        model, params, jax.random.PRNGKey(2), 300_000, capacity=space.shape[0]
    )
    assert int(dropped) == 0
    freq = {}
    for row, c in zip(np.asarray(bits), np.asarray(counts)):
        if c:
            freq[tuple(row.tolist())] = c / 300_000
    tv = sum(
        abs(freq.get(tuple(r.tolist()), 0.0) - pi) for r, pi in zip(space, p)
    )
    assert tv < 0.02, tv


def test_hybrid_sampling_consistent_with_amp():
    sorb, noa, nob = 8, 2, 2
    amp = ARRBM(sorb, noa, nob, nh=16)
    model = HybridWavefunction(amp, Jastrow(sorb))
    params = model.init(jax.random.PRNGKey(1))
    space = jnp.asarray(fci.fci_bits(sorb, noa, nob))
    lp_h = model.log_psi(params, space)
    lp_a = amp.log_psi(params["amp"], space)
    # hybrid |ψ|² equals amplitude-model |ψ|² (phase net only rotates)
    np.testing.assert_allclose(
        np.asarray(lp_h[..., 0]), np.asarray(lp_a[..., 0]), atol=1e-12
    )


def test_multipsi_vmc_energy_consistent():
    """MultiPsi exact-sampling energy must equal the plain ⟨ψ|H|ψ⟩."""
    import optax
    from functools import partial
    from pynqs_tpu.energy.eloc import local_energy_simple

    sys, e0, n_fci = _sys_e0()
    phi = RNNWavefunction(sys.sorb, sys.noa, sys.nob, hidden=8, phase_hidden=8)
    model = MultiPsi(phi, Jastrow(sys.sorb))
    params = model.init(jax.random.PRNGKey(0))
    space = jnp.asarray(fci.fci_bits(sys.sorb, sys.noa, sys.nob))
    lp = model.log_psi(params, space)
    p = np.exp(2 * np.asarray(lp[..., 0]))
    p = p / p.sum()
    eloc = local_energy_simple(
        partial(model.log_psi, params), space, sys.tables.astuple(),
        sys.excitation,
    )
    e_direct = float((p * np.asarray(eloc[:, 0])).sum())

    # AR sampling from φ with |f|² reweighting must estimate the same E
    sampler = ARSampler(
        sys.sorb, sys.noa, sys.nob, n_sample=1 << 16, capacity=n_fci
    )
    bits, w, _lp, _ = sampler.sample(model, params, jax.random.PRNGKey(5))
    f2 = np.exp(2 * np.asarray(model.log_factor(params, bits)[..., 0]))
    w = np.asarray(w) * np.where(np.asarray(w) > 0, f2, 0)
    w = w / w.sum()
    eloc_s = local_energy_simple(
        partial(model.log_psi, params), bits, sys.tables.astuple(),
        sys.excitation,
    )
    e_sampled = float((w * np.asarray(eloc_s[:, 0])).sum())
    assert abs(e_sampled - e_direct) < 0.02, (e_sampled, e_direct)


def test_spin_projection_idempotent_and_symmetric():
    sorb, noa, nob = 8, 2, 2
    base = RNNWavefunction(sorb, noa, nob, hidden=8, phase_hidden=8)
    eta = 1
    model = SpinProjected(base, eta)
    params = model.init(jax.random.PRNGKey(0))
    space = jnp.asarray(fci.fci_bits(sorb, noa, nob))
    from pynqs_tpu.ops import cplx

    lp = model.log_psi(params, space)
    psi = np.exp(cplx.to_np_complex(lp))
    # ψ_P must satisfy ψ_P(n̄)·s·η = ψ_P(n) (projection symmetry)
    flipped = onv.spin_flip_bits(space)
    s = np.asarray(onv.spin_flip_sign(space))
    lpf = model.log_psi(params, flipped)
    psif = np.exp(cplx.to_np_complex(lpf))
    np.testing.assert_allclose(psi, eta * s * psif, atol=1e-10)
