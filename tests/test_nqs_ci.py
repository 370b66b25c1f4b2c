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


def test_ci_polish_matches_bruteforce_projection():
    """ci_polish's (m+1)-dim eigenvalue vs the brute-force projection
    of H onto span{|d_i>, masked-phi} in the full FCI space: exact
    agreement when the capture is the full space and the REDUCE
    deterministic set covers every term; FCI <= E_polish <= E_VMC."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from pynqs_tpu.ci.nqs_ci import ci_polish
    from pynqs_tpu.energy.eloc import local_energy_simple
    from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN
    from pynqs_tpu.ops.hamiltonian import hij_dense
    from pynqs_tpu.ops.integrals import triangle_size
    from pynqs_tpu.utils import System, fci
    from functools import partial

    rng = np.random.default_rng(9)
    sorb, noa, nob = 8, 2, 2
    h1e = rng.standard_normal((sorb, sorb)) * 0.3
    h1e = (h1e + h1e.T) / 2
    h2e = rng.standard_normal(triangle_size(sorb)) * 0.1
    sys = System.from_integrals(h1e, h2e, sorb, noa, nob, dtype=np.float64)
    model = GraphMPSRNN(sorb, noa, nob, dcut=6)
    params = model.init(jax.random.PRNGKey(2))

    space = jnp.asarray(fci.fci_bits(sorb, noa, nob))
    ops = tuple(jnp.asarray(np.asarray(x)) for x in sys.tables.astuple())
    H = np.asarray(hij_dense(space, space, *ops))
    e_fci = np.linalg.eigvalsh(H)[0]

    lp = np.asarray(model.log_psi(params, space))
    psi = np.exp(lp[:, 0]) * np.exp(1j * lp[:, 1])
    assert abs(np.vdot(psi, psi) - 1.0) < 1e-8  # exact AR normalization
    e_vmc = float(np.real(np.vdot(psi, H @ psi)))

    # D = the 6 heaviest determinants
    order = np.argsort(-np.abs(psi))
    d_idx = np.sort(order[:6])
    d_bits = space[jnp.asarray(d_idx)]

    e, c, info = ci_polish(
        model, params, sys, d_bits, space, jax.random.PRNGKey(7),
        k_det=sys.excitation.n_sd, n_stoch=4, ci_chunk=4,
    )

    # brute-force projection basis: the d_i columns + masked phi
    n = space.shape[0]
    B = np.zeros((n, 7), complex)
    for j, i in enumerate(d_idx):
        B[i, j] = 1.0
    phi_c = psi.copy()
    phi_c[d_idx] = 0.0
    B[:, 6] = phi_c / np.linalg.norm(phi_c)
    heff = B.conj().T @ H @ B
    e_ref = np.linalg.eigvalsh(heff)[0]

    assert abs(e - e_ref) < 1e-8, (e, e_ref)
    assert e_fci - 1e-9 <= e <= e_vmc + 1e-9, (e_fci, e, e_vmc)
    assert info["captured_complement_fraction"] > 0.999


@pytest.mark.slow
def test_nqs_ci_grad_strategies_compare():
    """Reference grad strategies 0/1/2 (ci_vmc/hybrid.py:60-66,495-527)
    mapped to the Hellmann-Feynman form: 0 and 1 share the gradient and
    differ only in the warm-up floor; both must descend below the
    CI-only energy.  Strategy 2 (pure-NQS covariance, the reference
    marks it 'fail') runs but must not beat the coupled strategies by
    any margin -- theta never receives the CI coupling."""
    sys = System.hubbard_1d(4, 2, 2, u=4.0)
    dets = oracle.fci_space(sys.sorb, sys.noa, sys.nob)
    H = oracle.dense_h(dets, sys.h1e, decompress_h2e(sys.h2e, sys.sorb))
    w, v = np.linalg.eigh(H)
    space = fci.fci_bits(sys.sorb, sys.noa, sys.nob)
    order = np.argsort(-np.abs(v[:, 0]))[:6]
    d_bits = space[np.sort(order)]
    h_dd = H[np.ix_(np.sort(order), np.sort(order))]
    e_ci_only = np.linalg.eigvalsh(h_dd)[0]

    finals = {}
    for strat in (0, 1, 2):
        model = RNNWavefunction(
            sys.sorb, sys.noa, sys.nob, hidden=16, phase_hidden=8
        )
        nc = NqsCi(
            model, sys, d_bits,
            NqsCiConfig(
                n_iter=200, lr=5e-3, n_sample=1 << 13, capacity=len(dets),
                grad_strategy=strat, cnqs_pow_min=1e-4, start_iter=50,
            ),
        )
        _, c, hist = nc.run(jax.random.PRNGKey(strat))
        finals[strat] = float(np.mean(hist[-20:]))

    assert finals[0] < e_ci_only - 1e-3, finals
    assert finals[1] < e_ci_only - 1e-3, finals
    # the coupled strategies land in the same basin (different seeds
    # and warm-up floors give different transients at 200 iters)
    assert abs(finals[0] - finals[1]) < 0.25, finals
    # the decoupled strategy must not be better beyond noise
    assert finals[2] > min(finals[0], finals[1]) - 5e-3, finals


def test_ci_polish_f32_dead_slots_and_members_finite():
    """Round-4 production NaN regression: an f32 model whose masked
    forward underflows to exact zero on D rows (exp(la-690) == 0 in
    f32 -> inf eloc ratios) plus dead capacity padding in the capture.
    ci_polish must zero-weight both BEFORE touching eloc and return a
    finite, variational energy; dead rows must not shift the answer."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from pynqs_tpu.ci.nqs_ci import ci_polish
    from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN
    from pynqs_tpu.ops.hamiltonian import hij_dense
    from pynqs_tpu.ops.integrals import triangle_size
    from pynqs_tpu.utils import System, fci

    rng = np.random.default_rng(3)
    sorb, noa, nob = 8, 2, 2
    h1e = rng.standard_normal((sorb, sorb)) * 0.3
    h1e = (h1e + h1e.T) / 2
    h2e = rng.standard_normal(triangle_size(sorb)) * 0.1
    sys = System.from_integrals(h1e, h2e, sorb, noa, nob, dtype=np.float32)
    model = GraphMPSRNN(sorb, noa, nob, dcut=6, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(4))

    space = jnp.asarray(fci.fci_bits(sorb, noa, nob))
    lp = np.asarray(model.log_psi(params, space))
    assert lp.dtype == np.float32
    psi2 = np.exp(2.0 * lp[:, 0].astype(np.float64))
    d_idx = np.sort(np.argsort(-psi2)[:6])
    d_bits = space[jnp.asarray(d_idx)]

    # capture = full space + dead all-zero padding rows (counts == 0)
    pad = jnp.zeros((8, sorb), jnp.int8)
    capture = jnp.concatenate([space, pad])
    counts = np.concatenate([np.ones(space.shape[0]), np.zeros(8)])

    e, c, info = ci_polish(
        model, params, sys, d_bits, capture, jax.random.PRNGKey(7),
        sample_counts=counts, k_det=sys.excitation.n_sd, n_stoch=4,
        ci_chunk=4,
    )
    assert np.isfinite(e) and np.isfinite(info["h_nn"])

    e_ref, _, info_ref = ci_polish(
        model, params, sys, d_bits, space, jax.random.PRNGKey(7),
        k_det=sys.excitation.n_sd, n_stoch=4, ci_chunk=4,
    )
    assert abs(e - e_ref) < 5e-6, (e, e_ref)

    ops = tuple(jnp.asarray(np.asarray(x)) for x in sys.tables.astuple())
    H = np.asarray(hij_dense(space, space, *ops), np.float64)
    psi = np.exp(lp[:, 0].astype(np.float64)) * np.exp(1j * lp[:, 1])
    psi /= np.linalg.norm(psi)
    e_vmc = float(np.real(np.vdot(psi, H @ psi)))
    e_fci = np.linalg.eigvalsh(H)[0]
    assert e_fci - 1e-5 <= e <= e_vmc + 1e-5, (e_fci, e, e_vmc)


def test_ci_polish_capture_mode_exact_truncated_projection():
    """restrict='capture': with a PARTIAL capture the eigenvalue must
    equal the brute-force projection of H onto span{|d_i>, phi''}
    where phi'' is phi zeroed outside (capture \\ D) — an exact
    variational upper bound independent of complement coverage
    (the 'complement' mode is only exact at full coverage)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from pynqs_tpu.ci.nqs_ci import ci_polish
    from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN
    from pynqs_tpu.ops.hamiltonian import hij_dense
    from pynqs_tpu.ops.integrals import triangle_size
    from pynqs_tpu.utils import System, fci

    rng = np.random.default_rng(11)
    sorb, noa, nob = 8, 2, 2
    h1e = rng.standard_normal((sorb, sorb)) * 0.3
    h1e = (h1e + h1e.T) / 2
    h2e = rng.standard_normal(triangle_size(sorb)) * 0.1
    sys = System.from_integrals(h1e, h2e, sorb, noa, nob, dtype=np.float64)
    model = GraphMPSRNN(sorb, noa, nob, dcut=6)
    params = model.init(jax.random.PRNGKey(6))

    space = jnp.asarray(fci.fci_bits(sorb, noa, nob))
    n = space.shape[0]
    ops = tuple(jnp.asarray(np.asarray(x)) for x in sys.tables.astuple())
    H = np.asarray(hij_dense(space, space, *ops), np.float64)
    e_fci = np.linalg.eigvalsh(H)[0]

    lp = np.asarray(model.log_psi(params, space))
    psi = np.exp(lp[:, 0]) * np.exp(1j * lp[:, 1])
    d_idx = np.sort(np.argsort(-np.abs(psi))[:5])
    d_bits = space[jnp.asarray(d_idx)]

    # capture = D plus roughly half of the rest (a genuinely partial set)
    rest = np.setdiff1d(np.arange(n), d_idx)
    cap_idx = np.sort(np.concatenate([d_idx, rest[::2]]))
    capture = space[jnp.asarray(cap_idx)]

    e, c, info = ci_polish(
        model, params, sys, d_bits, capture, jax.random.PRNGKey(8),
        k_det=sys.excitation.n_sd, n_stoch=4, ci_chunk=4,
        restrict="capture",
    )

    # brute-force basis: d_i columns + phi zeroed outside capture \ D
    B = np.zeros((n, 6), complex)
    for j, i in enumerate(d_idx):
        B[i, j] = 1.0
    phi_c = np.zeros(n, complex)
    keep_idx = np.setdiff1d(cap_idx, d_idx)
    phi_c[keep_idx] = psi[keep_idx]
    B[:, 5] = phi_c / np.linalg.norm(phi_c)
    e_ref = np.linalg.eigvalsh(B.conj().T @ H @ B)[0]

    assert abs(e - e_ref) < 1e-8, (e, e_ref)
    assert e >= e_fci - 1e-9
    assert abs(info["captured_complement_fraction"] - 1.0) > 1e-3  # partial


def test_nqs_ci_eval_fwd_plumbing_exact():
    """eval_fwd (the fast gradient-free forward used for H_nn/H_cn
    assembly at production scale, round 5) must reproduce the default
    trajectory EXACTLY when it is model.log_psi itself — the option
    may only change which kernel evaluates, never the estimator."""
    import jax.numpy as jnp

    sys = System.hubbard_1d(4, 2, 2, u=4.0)
    dets = oracle.fci_space(sys.sorb, sys.noa, sys.nob)
    H = oracle.dense_h(dets, sys.h1e, decompress_h2e(sys.h2e, sys.sorb))
    _, v = np.linalg.eigh(H)
    space = fci.fci_bits(sys.sorb, sys.noa, sys.nob)
    order = np.argsort(-np.abs(v[:, 0]))[:6]
    d_bits = space[np.sort(order)]

    model = RNNWavefunction(sys.sorb, sys.noa, sys.nob, hidden=8,
                            phase_hidden=4)
    p0 = model.init(jax.random.PRNGKey(7))
    cfg = NqsCiConfig(n_iter=5, lr=5e-3, n_sample=1 << 10,
                      capacity=len(dets))
    hists = []
    for ef in (None, model.log_psi):
        nc = NqsCi(model, sys, d_bits, cfg, eval_fwd=ef)
        _, _, hist = nc.run(jax.random.PRNGKey(1),
                            params=jax.tree.map(jnp.array, p0))
        hists.append(np.asarray(hist))
    np.testing.assert_array_equal(hists[0], hists[1])
