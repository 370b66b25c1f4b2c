"""Scan-over-sites forms vs the python-unrolled loops.

The lax.scan forward (`GraphMPSRNN._log_psi_scan`) and AR driver
(`sampler/ar._ar_steps_scan`) keep the exact op shapes of the unrolled
forms, so parity is bitwise up to XLA scheduling — asserted tightly
here.  Compile time of both programs is O(1) in sorb (round-2 VERDICT
weak #10).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN, chain_graph, graph_from_edges
from pynqs_tpu.sampler import ar


def _rand_bits(rng, n, sorb, noa, nob):
    norb = sorb // 2
    out = np.zeros((n, sorb), np.int8)
    for s, no in ((0, noa), (1, nob)):
        cols = np.argsort(rng.random((n, norb)), axis=1)[:, :no]
        rows = np.repeat(np.arange(n), no)
        out[rows, 2 * cols.ravel() + s] = 1
    return jnp.asarray(out)


def _pair(**kw):
    scan = GraphMPSRNN(**kw, scan_sites=True)
    unrolled = GraphMPSRNN(**kw, scan_sites=False)
    return scan, unrolled


@pytest.mark.parametrize("phase_mode,norm_mode", [
    ("arg", "mpsrnn"), ("linear", "unit"),
])
def test_log_psi_scan_matches_unrolled(phase_mode, norm_mode):
    sorb, noa, nob = 12, 3, 3
    m_s, m_u = _pair(
        sorb=sorb, noa=noa, nob=nob, dcut=6, dtype=jnp.float32,
        phase_mode=phase_mode, norm_mode=norm_mode,
    )
    assert m_s.scan_ok and m_s._is_chain
    params = m_s.init(jax.random.PRNGKey(0))
    bits = _rand_bits(np.random.default_rng(1), 64, sorb, noa, nob)
    out_s = np.asarray(m_s.log_psi(params, bits))
    out_u = np.asarray(m_u.log_psi(params, bits))
    np.testing.assert_allclose(out_s, out_u, rtol=0, atol=1e-6)


def test_log_psi_scan_gradients_match():
    sorb, noa, nob = 8, 2, 2
    m_s, m_u = _pair(sorb=sorb, noa=noa, nob=nob, dcut=4, dtype=jnp.float64,
                     phase_mode="arg", norm_mode="mpsrnn")
    params = m_s.init(jax.random.PRNGKey(2))
    bits = _rand_bits(np.random.default_rng(3), 16, sorb, noa, nob)

    def loss(m):
        def f(p):
            return jnp.sum(m.log_psi(p, bits)[..., 0])
        return f

    g_s = jax.grad(loss(m_s))(params)
    g_u = jax.grad(loss(m_u))(params)
    for k in g_s:
        np.testing.assert_allclose(
            np.asarray(g_s[k]), np.asarray(g_u[k]), rtol=1e-9, atol=1e-9,
            err_msg=k,
        )


def test_ar_sampling_scan_matches_unrolled(monkeypatch):
    sorb, noa, nob = 12, 3, 3
    m = GraphMPSRNN(sorb=sorb, noa=noa, nob=nob, dcut=6, dtype=jnp.float32,
                    phase_mode="arg", norm_mode="mpsrnn")
    params = m.init(jax.random.PRNGKey(4))
    key = jax.random.PRNGKey(7)
    b1, c1, d1 = ar.ar_sampling(m, params, key, 50_000, capacity=64)
    monkeypatch.setattr(ar, "_FORCE_UNROLLED", True)
    b2, c2, d2 = ar.ar_sampling(m, params, key, 50_000, capacity=64)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    assert int(d1) == int(d2)


def test_ar_sampling_dfs_scan_matches_unrolled(monkeypatch):
    sorb, noa, nob = 12, 3, 3
    m = GraphMPSRNN(sorb=sorb, noa=noa, nob=nob, dcut=6, dtype=jnp.float32,
                    phase_mode="arg", norm_mode="mpsrnn")
    params = m.init(jax.random.PRNGKey(5))
    key = jax.random.PRNGKey(11)
    kw = dict(capacity=32, n_group=4, split_depth=3, capacity_root=64)
    b1, c1, d1 = ar.ar_sampling_dfs(m, params, key, 200_000, **kw)
    monkeypatch.setattr(ar, "_FORCE_UNROLLED", True)
    b2, c2, d2 = ar.ar_sampling_dfs(m, params, key, 200_000, **kw)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))


@pytest.mark.parametrize("norm_method", ["softmax-log", "norm", "softmax-sign"])
def test_transformer_ar_scan_matches_unrolled(monkeypatch, norm_method):
    from pynqs_tpu.models.transformer import DecoderWavefunction

    m = DecoderWavefunction(sorb=12, noa=3, nob=3, n_layer=2, n_head=2,
                            d_model=16, dtype=jnp.float32,
                            norm_method=norm_method)
    params = m.init(jax.random.PRNGKey(8))
    key = jax.random.PRNGKey(17)
    b1, c1, d1 = ar.ar_sampling(m, params, key, 30_000, capacity=64)
    monkeypatch.setattr(ar, "_FORCE_UNROLLED", True)
    b2, c2, d2 = ar.ar_sampling(m, params, key, 30_000, capacity=64)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    assert int(d1) == int(d2)


def test_tree_graph_ar_scan_matches_unrolled(monkeypatch):
    """Single-pred non-chain graph (a tree): AR scan keeps the register
    file, so it must agree too; log_psi falls back to unrolled."""
    norb = 6
    # star-ish tree: 0 -> 1, 0 -> 2, 2 -> 3, 2 -> 4, 4 -> 5
    g = graph_from_edges(norb, [(0, 1), (0, 2), (2, 3), (2, 4), (4, 5)])
    m = GraphMPSRNN(sorb=2 * norb, noa=3, nob=3, dcut=4, graph=g,
                    dtype=jnp.float32, phase_mode="arg", norm_mode="mpsrnn")
    assert m.maxp == 1
    if m._is_chain:
        pytest.skip("edge list unexpectedly formed a chain")
    params = m.init(jax.random.PRNGKey(6))
    key = jax.random.PRNGKey(13)
    b1, c1, _ = ar.ar_sampling(m, params, key, 20_000, capacity=64)
    monkeypatch.setattr(ar, "_FORCE_UNROLLED", True)
    b2, c2, _ = ar.ar_sampling(m, params, key, 20_000, capacity=64)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
