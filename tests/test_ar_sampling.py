"""Exact-AR sampling: frequencies vs |ψ|², symmetry, VMC convergence.

Mirrors the reference's inline smoke checks (decoder.py:859-925:
sampled frequencies vs |ψ|², sampled wf == forward wf) as real tests.
"""

import numpy as np
import jax
import pytest
import jax.numpy as jnp

import oracle
from pynqs_tpu.models.rnn import RNNWavefunction
from pynqs_tpu.optim.vmc import VMC, VMCConfig
from pynqs_tpu.sampler import ARSampler, ar_sampling
from pynqs_tpu.utils import System, fci


def _pack_rows(bits):
    return [tuple(int(x) for x in row) for row in np.asarray(bits)]


@pytest.mark.slow
def test_ar_frequencies_match_psi2():
    sorb, noa, nob = 8, 2, 2
    model = RNNWavefunction(sorb, noa, nob, hidden=16, phase_hidden=8)
    params = model.init(jax.random.PRNGKey(0))

    space = fci.fci_bits(sorb, noa, nob)
    lp = model.log_psi(params, jnp.asarray(space))
    p_exact = np.exp(2 * np.asarray(lp[..., 0]))
    assert abs(p_exact.sum() - 1.0) < 1e-9, "AR conditionals must normalize"

    n_sample = 1_000_000
    bits, counts, dropped = ar_sampling(
        model, params, jax.random.PRNGKey(7), n_sample, capacity=space.shape[0]
    )
    counts = np.asarray(counts)
    assert int(dropped) == 0
    assert counts.sum() == n_sample

    # all live rows have correct electron numbers
    live = counts > 0
    b = np.asarray(bits)[live]
    assert (b[:, 0::2].sum(1) == noa).all()
    assert (b[:, 1::2].sum(1) == nob).all()

    # empirical distribution vs |psi|^2 (total variation)
    freq = {}
    for row, c in zip(_pack_rows(bits), counts):
        if c > 0:
            freq[row] = freq.get(row, 0) + c / n_sample
    tv = 0.0
    for row, p in zip(_pack_rows(space), p_exact):
        tv += abs(freq.get(row, 0.0) - p)
    assert tv < 0.01, f"total variation {tv:.4f}"


def test_ar_capacity_compaction_keeps_largest():
    """With capacity < n_fci the kept mass ≈ top-capacity probability mass."""
    sorb, noa, nob = 8, 2, 2
    cap = 16
    model = RNNWavefunction(sorb, noa, nob, hidden=16)
    params = model.init(jax.random.PRNGKey(1))

    space = fci.fci_bits(sorb, noa, nob)
    lp = model.log_psi(params, jnp.asarray(space))
    p = np.sort(np.exp(2 * np.asarray(lp[..., 0])))[::-1]
    top_mass = p[:cap].sum()  # best possible kept mass at this capacity

    n_sample = 100_000
    bits, counts, dropped = ar_sampling(
        model, params, jax.random.PRNGKey(2), n_sample, capacity=cap
    )
    kept = 1.0 - int(dropped) / n_sample
    assert int(dropped) >= 0
    # greedy per-step compaction can't beat the global top-cap mass,
    # and should land near it (within 15% absolute for this size)
    assert kept <= top_mass + 0.01
    assert kept > top_mass - 0.15, (kept, top_mass)


@pytest.mark.slow
def test_vmc_ar_rnn_reaches_fci():
    sys = System.hubbard_1d(4, 2, 2, u=4.0)
    from pynqs_tpu.ops.integrals import decompress_h2e

    dets = oracle.fci_space(sys.sorb, sys.noa, sys.nob)
    H = oracle.dense_h(dets, sys.h1e, decompress_h2e(sys.h2e, sys.sorb))
    e0 = np.linalg.eigvalsh(H)[0]

    import optax

    model = RNNWavefunction(sys.sorb, sys.noa, sys.nob, hidden=16, phase_hidden=16)
    sampler = ARSampler(
        sys.sorb, sys.noa, sys.nob, n_sample=1 << 14, capacity=len(dets)
    )
    vmc = VMC(
        model,
        sys,
        sampler,
        VMCConfig(
            n_iter=600, use_sr=True, sr_damping=1e-2,
            optimizer=optax.sgd(5e-2), log_every=10**6,
        ),
    )
    _, hist = vmc.run(jax.random.PRNGKey(3))
    err_mha = abs(np.mean(hist[-20:]) - e0) * 1000
    assert err_mha < 5.0, f"AR-RNN VMC error {err_mha:.3f} mHa vs FCI {e0:.6f}"


def test_exact_weights_reproduce_full_space_measure():
    """exact_weights=True with a full-space capture: the sampler's
    weights must equal |ψ(x)|² exactly (Rao-Blackwellization), not the
    multinomial count frequencies."""
    sorb, noa, nob = 6, 2, 1
    model = RNNWavefunction(sorb, noa, nob, hidden=8, phase_hidden=8)
    params = model.init(jax.random.PRNGKey(3))
    space = fci.fci_bits(sorb, noa, nob)

    sampler = ARSampler(
        sorb, noa, nob, n_sample=5000, capacity=space.shape[0],
        exact_weights=True,
    )
    bits, w, lp, _ = sampler.sample(model, params, jax.random.PRNGKey(11))
    w = np.asarray(w)
    p_fwd = np.exp(2 * np.asarray(lp[..., 0]))
    live = w > 0
    # weights == renormalized |psi|^2 of the captured rows
    np.testing.assert_allclose(
        w[live], p_fwd[live] / p_fwd[live].sum(), rtol=1e-5
    )
    # full capture at n=5000 on a 15-det space: weights are the exact
    # measure, so they also match the enumerated |psi|^2 per det
    lookup = dict(zip(_pack_rows(space),
                      np.exp(2 * np.asarray(
                          model.log_psi(params, jnp.asarray(space))[..., 0]))))
    cap = sum(lookup[r] for r, alive in zip(_pack_rows(bits), live) if alive)
    for row, alive, wi in zip(_pack_rows(bits), live, w):
        if alive:
            np.testing.assert_allclose(wi, lookup[row] / cap, rtol=1e-5)
