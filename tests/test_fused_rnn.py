"""Pallas fused Graph-MPS-RNN forward vs the XLA forward (interpret
mode on CPU; the same kernel runs compiled on TPU).

Oracle: models/graph_mps_rnn.log_psi — itself validated against the
independent second-quantization oracle through the Fe2S2 DMRG import
(scripts/validate_fe2s2_import.py) and the eloc identity tests.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN, grid_snake_graph
from pynqs_tpu.ops.fused_rnn import (
    fused_forward_available,
    graph_mpsrnn_logpsi_fused,
)
from pynqs_tpu.utils import fci


def _check(model, params, bits, tol=1e-5):
    ref = np.asarray(model.log_psi(params, bits))
    out = np.asarray(
        graph_mpsrnn_logpsi_fused(
            model, params, bits, interpret=True, matmul_dtype=jnp.float32
        )
    )
    np.testing.assert_allclose(out[:, 0], ref[:, 0], atol=tol, rtol=0)
    # phases compared on the unit circle (mod 2π)
    d = np.abs(np.exp(1j * out[:, 1]) - np.exp(1j * ref[:, 1]))
    assert d.max() < 10 * tol, d.max()


@pytest.mark.parametrize("phase_mode", ["arg", "linear"])
@pytest.mark.parametrize("norm_mode", ["mpsrnn", "unit"])
def test_fused_matches_xla_chain(phase_mode, norm_mode):
    model = GraphMPSRNN(
        12, 3, 3, dcut=10, dtype=jnp.float32,
        phase_mode=phase_mode, norm_mode=norm_mode,
    )
    params = model.init(jax.random.PRNGKey(1))
    bits = jnp.asarray(fci.fci_bits(12, 3, 3))[:333]  # non-multiple of TB
    assert fused_forward_available(model)
    _check(model, params, bits)


def test_fused_matches_xla_chain_large_dcut():
    """dcut 33..48 takes the dp=48 tier; dcut > 48 the 64-multiple
    tier (the dcut<=32 tests above exercise the dp=32 tier)."""
    for d in (40, 50):
        model = GraphMPSRNN(
            8, 2, 2, dcut=d, dtype=jnp.float32,
            phase_mode="arg", norm_mode="mpsrnn",
        )
        params = model.init(jax.random.PRNGKey(7))
        bits = jnp.asarray(fci.fci_bits(8, 2, 2))[:60]
        _check(model, params, bits)


def test_fused_matches_xla_dag():
    model = GraphMPSRNN(
        12, 3, 3, dcut=8, dtype=jnp.float32, graph=grid_snake_graph(3, 2),
        phase_mode="arg", norm_mode="mpsrnn",
    )
    params = model.init(jax.random.PRNGKey(2))
    bits = jnp.asarray(fci.fci_bits(12, 3, 3))[:100]
    _check(model, params, bits)


def test_fused_zero_phase_readout_sites():
    """DMRG imports zero every site's phase readout but the last —
    z = 0 must contribute phase 0 (atan2(0,0) = 0), not poison the
    unit-product accumulation (the round-2 Fe2S2 +389 mHa bug)."""
    model = GraphMPSRNN(
        12, 3, 3, dcut=6, dtype=jnp.float32,
        phase_mode="arg", norm_mode="mpsrnn",
    )
    params = dict(model.init(jax.random.PRNGKey(3)))
    for k in ("w_arg_re", "w_arg_im", "c_arg_re", "c_arg_im"):
        params[k] = params[k].at[:-1].set(0.0)
    bits = jnp.asarray(fci.fci_bits(12, 3, 3))[:64]
    _check(model, params, bits)


def test_fused_matches_xla_tensor_coupling():
    """Multi-predecessor DAG WITH the compressed tensor coupling
    (VERDICT round-2 missing #3): the fused kernel must agree with the
    XLA path at sites with ≥2 predecessors."""
    model = GraphMPSRNN(
        12, 3, 3, dcut=8, dcut_cmpr=4, dtype=jnp.float32,
        graph=grid_snake_graph(3, 2), use_tensor=True,
        phase_mode="arg", norm_mode="mpsrnn",
    )
    assert fused_forward_available(model)
    params = model.init(jax.random.PRNGKey(4))
    bits = jnp.asarray(fci.fci_bits(12, 3, 3))[:100]
    _check(model, params, bits)


def test_fused_matches_xla_tensor_extra_pred_chain():
    """Chain + extra max-weight predecessor edges (utils/graph
    dag_from_order), tensor coupling on — the plateau-attack model
    shape for Fe2S2."""
    from pynqs_tpu.utils.graph import dag_from_order

    rng = np.random.default_rng(0)
    w = np.abs(rng.standard_normal((6, 6)))
    g = dag_from_order(list(range(6)), w, max_preds=3)
    model = GraphMPSRNN(
        12, 3, 3, dcut=8, dcut_cmpr=4, dtype=jnp.float32,
        graph=g, use_tensor=True, phase_mode="linear", norm_mode="unit",
    )
    params = model.init(jax.random.PRNGKey(5))
    bits = jnp.asarray(fci.fci_bits(12, 3, 3))[:64]
    _check(model, params, bits)
