"""Utility coverage: orbital-ordering graphs, stats, tools, lsm loss."""

import numpy as np
import jax
import jax.numpy as jnp

from pynqs_tpu.utils import fci
from pynqs_tpu.utils.graph import (
    dag_from_order,
    exchange_matrix,
    fiedler_order,
    greedy_order,
)
from pynqs_tpu.utils.stats import operator_stats, weighted_stats
from pynqs_tpu.utils.tools import repro_header


def test_orbital_orderings():
    # two strongly-coupled pairs (0,3) and (1,2), weak elsewhere
    w = np.array(
        [
            [0.0, 0.1, 0.1, 5.0],
            [0.1, 0.0, 5.0, 0.1],
            [0.1, 5.0, 0.0, 0.1],
            [5.0, 0.1, 0.1, 0.0],
        ]
    )
    fo = fiedler_order(w)
    assert sorted(fo) == [0, 1, 2, 3]
    # fiedler puts coupled pairs adjacent
    pos = {s: i for i, s in enumerate(fo)}
    assert abs(pos[0] - pos[3]) == 1
    assert abs(pos[1] - pos[2]) == 1

    go = greedy_order(w)
    assert sorted(go) == [0, 1, 2, 3]
    # greedy's first step follows the max edge
    assert {go[0], go[1]} in ({0, 3}, {1, 2})

    order, preds = dag_from_order(fo, w, max_preds=2)
    assert order == fo
    assert max(len(p) for p in preds) <= 2
    assert sum(len(p) for p in preds) >= len(fo) - 1  # at least the chain


def test_exchange_matrix_fe2s2_like():
    from pynqs_tpu.ops.integrals import compress_h2e
    import sys as _s

    _s.path.insert(0, "tests")
    import oracle

    rng = np.random.default_rng(0)
    sorb = 8
    h2e_dense = oracle.random_antisym_h2e(sorb, rng)
    K = exchange_matrix(compress_h2e(h2e_dense, sorb), sorb)
    assert K.shape == (4, 4)
    np.testing.assert_allclose(K, K.T, atol=1e-12)
    assert (np.diag(K) == 0).all()


def test_weighted_stats_vs_numpy():
    rng = np.random.default_rng(1)
    v = rng.standard_normal(100)
    w = np.abs(rng.standard_normal(100))
    w[::9] = 0.0
    w = w / w.sum()
    mean, var, se, n_eff = weighted_stats(jnp.asarray(v), jnp.asarray(w))
    np.testing.assert_allclose(float(mean), (w * v).sum(), atol=1e-12)
    np.testing.assert_allclose(
        float(var), (w * (v - (w * v).sum()) ** 2).sum(), atol=1e-12
    )
    s = operator_stats(jnp.asarray(v), jnp.asarray(w))
    assert "±" in str(s)


def test_repro_header():
    h = repro_header()
    assert "jax" in h and "python" in h


def test_citrain_lsm_loss():
    from pynqs_tpu.ci import CITrain, CITrainConfig, CIWavefunction
    from pynqs_tpu.models.rnn import RNNWavefunction

    sorb, noa, nob = 8, 2, 2
    space = fci.fci_bits(sorb, noa, nob)
    rng = np.random.default_rng(2)
    c = rng.standard_normal(space.shape[0])
    c[np.abs(c) < 0.5] = 0.01  # peaked-ish
    ci = CIWavefunction(coeffs=np.abs(c), bits=space)  # positive target
    model = RNNWavefunction(sorb, noa, nob, hidden=16, phase_hidden=8)
    tr = CITrain(model, ci, CITrainConfig(n_iter=300, lr=1e-2, loss="lsm"))
    params, hist = tr.run(jax.random.PRNGKey(0))
    assert hist[-1] < hist[0] * 0.5  # loss halved
    assert tr.overlap(params) > 0.9


def test_with_operator_spin_raising_penalty():
    """System.with_operator composes H + c*O at the integral level
    (reference threads use_spin_raising through the optimizer instead,
    example/Fe2S2/Fe2S2-OO-dcut-20.py:161-163).  The S-S+ penalty is
    PSD and leaves a singlet ground state untouched."""
    import numpy as np
    import numpy.linalg as la
    import jax.numpy as jnp

    from pynqs_tpu.native import fci_space_bits
    from pynqs_tpu.ops.hamiltonian import hij_dense
    from pynqs_tpu.ops.integrals import precompute_hij_tables, spin_raising
    from pynqs_tpu.utils import System

    sys_ = System.hubbard_1d(4, 2, 2, u=4.0)
    h1e_s, h2e_s = spin_raising(sys_.sorb)
    c = 0.7
    sys_p = sys_.with_operator(h1e_s, h2e_s, c)
    space = jnp.asarray(fci_space_bits(sys_.sorb, sys_.noa, sys_.nob))

    def dense(s):
        ops = tuple(jnp.asarray(np.asarray(x)) for x in s.tables.astuple())
        return np.asarray(hij_dense(space, space, *ops))

    t_s = precompute_hij_tables(h1e_s, h2e_s, sys_.sorb, np.float64)
    ops_s = tuple(jnp.asarray(x) for x in (t_s.h1e, t_s.h2e, t_s.diag1, t_s.K, t_s.J))
    H, P = dense(sys_), dense(sys_p)
    S = np.asarray(hij_dense(space, space, *ops_s))
    assert np.abs(P - (H + c * S)).max() < 1e-12
    assert abs(la.eigvalsh(H)[0] - la.eigvalsh(P)[0]) < 1e-10  # singlet gs
    assert la.eigvalsh(S)[0] > -1e-12  # penalty PSD
