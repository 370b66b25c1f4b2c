"""MPS ansatz + DMRG warm-start import."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pynqs_tpu.models.mps import MPSWavefunction
from pynqs_tpu.ops import cplx
from pynqs_tpu.utils import fci


def test_mps_log_psi_vs_numpy_contraction():
    sorb, d = 8, 5
    model = MPSWavefunction(sorb, dcut=d)
    params = model.init(jax.random.PRNGKey(0))
    space = fci.fci_bits(sorb, 2, 2)
    lp = model.log_psi(params, jnp.asarray(space))
    psi = np.exp(cplx.to_np_complex(lp))

    A = np.asarray(params["A_re"]) + 1j * np.asarray(params["A_im"])
    l = np.asarray(params["l"]).astype(complex)
    r = np.asarray(params["r"]).astype(complex)
    for row, got in zip(space, psi):
        v = l.copy()
        for t in range(sorb // 2):
            x = int(row[2 * t] + 2 * row[2 * t + 1])
            v = v @ A[t, x]
        ref = v @ r
        np.testing.assert_allclose(got, ref, rtol=1e-9)


@pytest.mark.skipif(
    not __import__("os").path.exists(
        "/root/reference/example/Fe2S2/fe2s2-OO-dcut-20-focus-1e-8.pth"
    ),
    reason="reference Fe2S2 DMRG file not available",
)
def test_focus_import_samples_and_normalizes():
    from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN
    from pynqs_tpu.sampler.ar import ar_sampling
    from pynqs_tpu.utils import System
    from pynqs_tpu.utils.mps_import import load_focus_mpsrnn

    sys = System.from_pth("/root/reference/example/Fe2S2/fe2s2-OO.pth")
    model = GraphMPSRNN(
        sys.sorb, sys.noa, sys.nob, dcut=20,
        phase_mode="arg", norm_mode="mpsrnn",
    )
    params = load_focus_mpsrnn(
        "/root/reference/example/Fe2S2/fe2s2-OO-dcut-20-focus-1e-8.pth", model
    )
    bits, counts, dropped = ar_sampling(
        model, params, jax.random.PRNGKey(0), 50_000, capacity=256
    )
    counts = np.asarray(counts)
    assert counts.sum() > 0
    live = counts > 0
    b = np.asarray(bits)[live]
    assert (b[:, 0::2].sum(1) == sys.noa).all()
    assert (b[:, 1::2].sum(1) == sys.nob).all()
    lp = model.log_psi(params, jnp.asarray(b[:16]))
    assert bool(jnp.isfinite(lp).all())
    # the DMRG state is strongly peaked: dominant |psi|^2 > 0.3
    assert counts.max() / counts.sum() > 0.3


def test_structural_warm_start_preserves_wavefunction():
    """Chain checkpoint -> multi-predecessor + tensor-coupled model:
    with fresh_scale=0 the extra couplings are exactly zero, so the
    re-expressed model computes the SAME wavefunction; at the default
    near-zero fresh_scale it stays close."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN
    from pynqs_tpu.utils import fci
    from pynqs_tpu.utils.graph import dag_from_order
    from pynqs_tpu.utils.mps_import import structural_warm_start

    sorb, noa, nob = 8, 2, 2
    chain = GraphMPSRNN(sorb, noa, nob, dcut=6)
    p_chain = chain.init(jax.random.PRNGKey(1))
    # jitter so the checkpoint is not at init
    p_chain = jax.tree.map(
        lambda x: x + 0.1 * jnp.ones_like(x), p_chain
    )

    rng = np.random.default_rng(0)
    Kx = np.abs(rng.standard_normal((sorb // 2, sorb // 2)))
    Kx = (Kx + Kx.T) / 2
    graph = dag_from_order(list(range(sorb // 2)), Kx, max_preds=2)
    big = GraphMPSRNN(
        sorb, noa, nob, dcut=6, graph=graph, use_tensor=True
    )
    space = jnp.asarray(fci.fci_bits(sorb, noa, nob))
    lp_ref = np.asarray(chain.log_psi(p_chain, space))

    p0 = structural_warm_start(p_chain, big, fresh_scale=0.0)
    lp0 = np.asarray(big.log_psi(p0, space))
    np.testing.assert_allclose(lp0[:, 0], lp_ref[:, 0], atol=1e-10)
    # phases equal mod 2π
    dphi = (lp0[:, 1] - lp_ref[:, 1] + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(dphi, 0.0, atol=1e-5)

    p1 = structural_warm_start(p_chain, big, fresh_scale=1e-2)
    lp1 = np.asarray(big.log_psi(p1, space))
    assert np.abs(lp1[:, 0] - lp_ref[:, 0]).max() < 0.2
