"""Graph-MPS-RNN: normalization, ordering signs, sampling, VMC."""

import numpy as np
import jax
import pytest
import jax.numpy as jnp

import oracle
from pynqs_tpu.models.graph_mps_rnn import (
    GraphMPSRNN,
    chain_graph,
    graph_from_edges,
    grid_snake_graph,
)
from pynqs_tpu.ops import onv
from pynqs_tpu.optim.vmc import VMC, VMCConfig
from pynqs_tpu.sampler import ARSampler, ar_sampling
from pynqs_tpu.utils import System, fci


def test_permute_sgn_vs_bruteforce():
    rng = np.random.default_rng(0)
    sorb = 10
    for trial in range(20):
        order = rng.permutation(sorb)
        A = onv.permute_sgn_matrix(order)
        bits = rng.integers(0, 2, sorb).astype(np.int8)
        got = int(
            np.asarray(
                onv.permute_sgn(jnp.asarray(bits)[order], jnp.asarray(A))
            )
        )
        # brute force: sign of sorting the occupied orbitals as listed
        # in visiting order back to ascending order
        occ_seq = [int(order[t]) for t in range(sorb) if bits[order[t]]]
        sgn = 1
        arr = occ_seq[:]
        for i in range(len(arr)):
            for j in range(i + 1, len(arr)):
                if arr[i] > arr[j]:
                    sgn = -sgn
        assert got == sgn, (trial, order, bits, got, sgn)


def _check_normalized_and_sampling(model, key=0, n_sample=300_000, tv_tol=0.015):
    params = model.init(jax.random.PRNGKey(key))
    space = fci.fci_bits(model.sorb, model.noa, model.nob)
    lp = model.log_psi(params, jnp.asarray(space))
    p = np.exp(2 * np.asarray(lp[..., 0]))
    assert abs(p.sum() - 1.0) < 1e-9, p.sum()

    bits, counts, dropped = ar_sampling(
        model, params, jax.random.PRNGKey(9), n_sample, capacity=space.shape[0]
    )
    assert int(dropped) == 0
    freq = {}
    for row, c in zip(np.asarray(bits), np.asarray(counts)):
        if c:
            freq[tuple(row.tolist())] = c / n_sample
    tv = sum(
        abs(freq.get(tuple(r.tolist()), 0.0) - pi) for r, pi in zip(space, p)
    )
    assert tv < tv_tol, f"total variation {tv}"


def test_chain_graph_normalized_and_sampling():
    model = GraphMPSRNN(sorb=8, noa=2, nob=2, dcut=6)
    _check_normalized_and_sampling(model)


def test_nontrivial_order_and_multi_pred_graph():
    # order: 2,0,3,1 with an extra skip edge 2->1
    order = [2, 0, 3, 1]
    edges = [(2, 0), (0, 3), (3, 1), (2, 1)]
    g = graph_from_edges(4, edges, order)
    model = GraphMPSRNN(sorb=8, noa=2, nob=2, dcut=6, graph=g)
    _check_normalized_and_sampling(model, key=3)


def test_tensor_coupling_normalized_and_sampling():
    # multi-predecessor graph with the compressed tensor term active
    order = [0, 1, 2, 3]
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (1, 3)]
    g = graph_from_edges(4, edges, order)
    model = GraphMPSRNN(
        sorb=8, noa=2, nob=2, dcut=6, graph=g,
        use_tensor=True, dcut_cmpr=3,
    )
    _check_normalized_and_sampling(model, key=7)


def test_grid_snake_graph_shapes():
    g = grid_snake_graph(3, 2)
    model = GraphMPSRNN(sorb=12, noa=2, nob=2, dcut=4, graph=g)
    # 225 dets @ 200k samples: expected TV ≈ sqrt(2·225/(π·2e5)) ≈ 0.027
    _check_normalized_and_sampling(model, key=5, n_sample=200_000, tv_tol=0.04)


@pytest.mark.slow
def test_vmc_graph_mps_rnn_reaches_fci():
    sys = System.hubbard_1d(4, 2, 2, u=4.0)
    from pynqs_tpu.ops.integrals import decompress_h2e

    dets = oracle.fci_space(sys.sorb, sys.noa, sys.nob)
    H = oracle.dense_h(dets, sys.h1e, decompress_h2e(sys.h2e, sys.sorb))
    e0 = np.linalg.eigvalsh(H)[0]

    model = GraphMPSRNN(sys.sorb, sys.noa, sys.nob, dcut=8)
    sampler = ARSampler(
        sys.sorb, sys.noa, sys.nob, n_sample=1 << 13, capacity=len(dets)
    )
    vmc = VMC(model, sys, sampler, VMCConfig(n_iter=400, lr=1e-2))
    _, hist = vmc.run(jax.random.PRNGKey(11))
    err_mha = abs(np.mean(hist[-20:]) - e0) * 1000
    assert err_mha < 5.0, f"GraphMPSRNN error {err_mha:.3f} mHa vs {e0:.6f}"
