"""Prefix-sharing fused forward vs the full fused forward (interpret
mode on CPU; the same kernels run compiled on TPU).

The prefix forward must be BIT-COMPATIBLE with the static fused
forward: a child block replays the same f32 op sequence from its
block-start site s0, seeded with the parent's recurrence state — so
the only acceptable mismatch is the usual interpret-mode roundoff of
re-associated reductions (we compare with the same tolerances the
fused-vs-XLA tests use).

Oracle: ops/fused_rnn.graph_mpsrnn_logpsi_fused — itself pinned to
models/graph_mps_rnn.log_psi (tests/test_fused_rnn.py).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN
from pynqs_tpu.ops.fused_rnn import graph_mpsrnn_logpsi_fused
from pynqs_tpu.ops.fused_rnn_prefix import (
    graph_mpsrnn_logpsi_fused_prefix,
    prefix_available,
    sort_children_by_t_min,
    t_min_process_order,
)
from pynqs_tpu.utils import fci


def _setup(sorb, na, nb, dcut, seed, phase_mode="arg", norm_mode="mpsrnn"):
    model = GraphMPSRNN(
        sorb, na, nb, dcut=dcut, dtype=jnp.float32,
        phase_mode=phase_mode, norm_mode=norm_mode,
    )
    params = model.init(jax.random.PRNGKey(seed))
    bits = np.asarray(fci.fci_bits(sorb, na, nb))
    return model, params, bits


def _children_from_space(bits, B, C, seed):
    """Parents = first B rows; children drawn from the same FCI space
    (generic rows, NOT restricted to excitations — parity must hold for
    arbitrary t_min patterns, including t_min = 0)."""
    rng = np.random.default_rng(seed)
    parents = bits[:B]
    kids = bits[rng.integers(0, len(bits), size=(B, C))]
    # make a few children equal to their parent (t_min = norb rows)
    kids[:, 0] = parents
    return jnp.asarray(parents), jnp.asarray(kids)


def _check(model, params, parents, kids, *, sort, child_block=8,
           parent_block=16, tol=1e-5):
    tm = t_min_process_order(model, parents, kids)
    if sort:
        kids_s, tm_s, inv = sort_children_by_t_min(kids, tm)
    else:
        kids_s, tm_s, inv = kids, tm, None
    lp_p, lp_c = graph_mpsrnn_logpsi_fused_prefix(
        model, params, parents, kids_s, tm_s,
        child_block=child_block, parent_block=parent_block,
        interpret=True, matmul_dtype=jnp.float32,
    )
    if inv is not None:
        lp_c = jnp.take_along_axis(lp_c, inv[..., None], axis=1)
    B, C, sorb = kids.shape
    ref = np.asarray(
        graph_mpsrnn_logpsi_fused(
            model, params,
            jnp.concatenate([parents, kids.reshape(B * C, sorb)], 0),
            interpret=True, matmul_dtype=jnp.float32,
        )
    )
    ref_p, ref_c = ref[:B], ref[B:].reshape(B, C, 2)
    for out, want in ((np.asarray(lp_p), ref_p),
                      (np.asarray(lp_c).reshape(-1, 2),
                       ref_c.reshape(-1, 2))):
        np.testing.assert_allclose(out[:, 0], want[:, 0], atol=tol, rtol=0)
        d = np.abs(np.exp(1j * out[:, 1]) - np.exp(1j * want[:, 1]))
        assert d.max() < 10 * tol, d.max()


def test_t_min_process_order():
    model, _, bits = _setup(12, 3, 3, 6, 0)
    parents = jnp.asarray(bits[:5])
    kids = jnp.asarray(bits[5:15]).reshape(1, 10, 12)
    kids = jnp.broadcast_to(kids, (5, 10, 12))
    tm = np.asarray(t_min_process_order(model, parents, kids))
    order = np.asarray(model._order)
    for b in range(5):
        for c in range(10):
            pv = bits[b, 0::2] + 2 * bits[b, 1::2]
            cv = bits[5 + c, 0::2] + 2 * bits[5 + c, 1::2]
            want = model.norb
            for t in range(model.norb):
                if pv[order[t]] != cv[order[t]]:
                    want = t
                    break
            assert tm[b, c] == want
    # identical rows -> norb
    tm_self = np.asarray(
        t_min_process_order(model, parents, parents[:, None, :])
    )
    assert (tm_self == model.norb).all()


@pytest.mark.parametrize("phase_mode", ["arg", "linear"])
def test_prefix_matches_fused(phase_mode):
    model, params, bits = _setup(12, 3, 3, 10, 1, phase_mode=phase_mode)
    assert prefix_available(model)
    parents, kids = _children_from_space(bits, 6, 20, 2)
    _check(model, params, parents, kids, sort=True)


def test_prefix_matches_fused_unsorted():
    """Parity must not depend on the t_min sort (only savings do)."""
    model, params, bits = _setup(12, 3, 3, 8, 3)
    parents, kids = _children_from_space(bits, 4, 13, 4)  # C pad too
    _check(model, params, parents, kids, sort=False)


def test_prefix_matches_fused_norm_unit():
    model, params, bits = _setup(8, 2, 2, 40, 5, norm_mode="unit")
    parents, kids = _children_from_space(bits, 3, 9, 6)
    _check(model, params, parents, kids, sort=True, child_block=4,
           parent_block=8)


def test_prefix_excitation_children():
    """Realistic REDUCE shape: children = single/double excitations of
    the parent (the t_min distribution the savings argument is about)."""
    model, params, bits = _setup(12, 3, 3, 10, 7)
    rng = np.random.default_rng(8)
    parents = bits[rng.integers(0, len(bits), size=6)]
    kids = np.empty((6, 12, 12), np.uint8)
    for b in range(6):
        p = parents[b]
        occ = np.flatnonzero(p)
        vir = np.flatnonzero(1 - p)
        for c in range(12):
            k = p.copy()
            o = rng.choice(occ, size=rng.integers(1, 3), replace=False)
            v = rng.choice(vir, size=len(o), replace=False)
            k[o], k[v] = 0, 1
            kids[b, c] = k
    _check(model, params, jnp.asarray(parents), jnp.asarray(kids),
           sort=True, child_block=4, parent_block=8)


def _reduce_system(sorb=12, na=3, nb=3, seed=0):
    from pynqs_tpu.ops import integrals as ints
    from pynqs_tpu.utils import System

    rng = np.random.default_rng(seed)
    h1e = rng.standard_normal((sorb, sorb)) * 0.1
    h1e = (h1e + h1e.T) / 2
    h2e = rng.standard_normal(ints.triangle_size(sorb)) * 0.02
    return System.from_integrals(h1e, h2e, sorb, na, nb, dtype=np.float64)


@pytest.mark.parametrize("topk", ["exact", "segmax"])
def test_reduce_eloc_prefix_matches_flat(topk):
    """local_energy_reduce(prefix_fwd=...) == the flat-forward path on
    the same key: the t_min sorts only reorder the order-invariant det
    and tail sums, and the prefix forward is bit-compatible with the
    full fused forward (interpret mode on CPU)."""
    from pynqs_tpu.energy.eloc import local_energy_reduce
    from pynqs_tpu.ops.fused_rnn import graph_mpsrnn_logpsi_fused
    from pynqs_tpu.ops.fused_rnn_prefix import ReducePrefixForward

    sys_ = _reduce_system()
    model, params, bits = _setup(sys_.sorb, sys_.noa, sys_.nob, 8, 11)
    ops = tuple(jnp.asarray(np.asarray(x), jnp.float32)
                for x in sys_.tables.astuple())
    hpair = jnp.asarray(np.asarray(sys_.tables.hpair), jnp.float32)
    rows = jnp.asarray(bits[np.random.default_rng(1).integers(
        0, len(bits), size=10)])

    flat_fwd = partial(
        graph_mpsrnn_logpsi_fused, model, params,
        interpret=True, matmul_dtype=jnp.float32,
    )
    pf = ReducePrefixForward(
        model, params, child_block=8, parent_block=8,
        matmul_dtype=jnp.float32, interpret=True,
    )
    kw = dict(k_det=16, n_stoch=8, hpair=hpair, topk=topk)
    key = jax.random.PRNGKey(3)
    e_flat = np.asarray(local_energy_reduce(
        flat_fwd, rows, ops, sys_.excitation, key, **kw))
    e_pref = np.asarray(local_energy_reduce(
        flat_fwd, rows, ops, sys_.excitation, key, prefix_fwd=pf, **kw))
    np.testing.assert_allclose(e_pref, e_flat, atol=2e-5, rtol=0)

    # chunked path
    e_pref_b = np.asarray(local_energy_reduce(
        flat_fwd, rows, ops, sys_.excitation, key, prefix_fwd=pf,
        batch=5, **kw))
    e_flat_b = np.asarray(local_energy_reduce(
        flat_fwd, rows, ops, sys_.excitation, key, batch=5, **kw))
    np.testing.assert_allclose(e_pref_b, e_flat_b, atol=2e-5, rtol=0)


def test_t_min_from_packed_matches_bits():
    """Packed-quadruple t_min == the bit-diff t_min on the built rows."""
    from pynqs_tpu.ops.fused_rnn_prefix import t_min_from_packed

    sys_ = _reduce_system()
    model, _, bits = _setup(sys_.sorb, sys_.noa, sys_.nob, 4, 2)
    from pynqs_tpu.ops import onv as onv_ops
    from pynqs_tpu.energy.eloc import _excite_bits

    table = sys_.excitation
    rows = jnp.asarray(bits[:7])
    merged = onv_ops.merged_orbital_list(rows, table.noa, table.nob)
    orbs = jnp.take(merged, jnp.asarray(table.pos), axis=-1)  # [B,n_sd,4]
    ow = 7
    opack = (
        orbs[..., 0] | (orbs[..., 1] << ow) | (orbs[..., 2] << (2 * ow))
        | (orbs[..., 3] << (3 * ow))
    ).astype(jnp.int32)
    got = np.asarray(t_min_from_packed(model, opack, ow))
    ns = table.n_singles
    is_d = jnp.arange(table.n_sd)[None, :] >= ns
    kids = _excite_bits(rows, orbs, jnp.broadcast_to(is_d, opack.shape))
    want = np.asarray(t_min_process_order(model, rows, kids))
    np.testing.assert_array_equal(got, want)
