"""Round-2 sampling machinery: slabbed AR trees + the stratified
inverse-CDF tail sampler.

Oracles: exact enumeration of |ψ|² over the sector (slabbed law /
capacity bias) and exact categorical probabilities (CDF sampler).
"""

import numpy as np
import jax
import jax.numpy as jnp

from pynqs_tpu.energy.eloc import _sample_tail_cdf
from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN
from pynqs_tpu.sampler.ar import ar_sampling, ar_sampling_slabbed
from pynqs_tpu.utils import fci


def test_cdf_tail_sampler_marginals():
    w = jnp.asarray(np.random.default_rng(0).random((3, 300)) ** 4)
    counts = np.zeros((3, 300))
    for i in range(200):
        idx = np.asarray(_sample_tail_cdf(jax.random.PRNGKey(i), w, 64))
        assert idx.min() >= 0 and idx.max() < 300
        for r in range(3):
            np.add.at(counts[r], idx[r], 1)
    emp = counts / counts.sum(1, keepdims=True)
    ref = np.asarray(w / w.sum(1, keepdims=True))
    assert np.abs(emp - ref).max() < 8e-3


def test_cdf_tail_sampler_skips_zero_weight():
    # zero-weight entries must never be drawn
    w = np.ones((2, 200))
    w[:, ::2] = 0.0
    idx = np.asarray(
        _sample_tail_cdf(jax.random.PRNGKey(1), jnp.asarray(w), 512)
    )
    assert (idx % 2 == 1).all()


def _tv(model, params, space, p, bits, counts):
    eq = (np.asarray(bits)[:, None, :] == np.asarray(space)[None, :, :]).all(
        -1
    )
    idx = eq.argmax(1)
    live = np.asarray(counts) > 0
    emp = np.zeros(space.shape[0])
    np.add.at(emp, idx[live], np.asarray(counts)[live])
    emp /= max(emp.sum(), 1)
    return 0.5 * np.abs(emp - p).sum()


def test_slabbed_sampling_reduces_capacity_bias():
    """VERDICT round-1 weak #6: quantify the truncation bias when
    capacity binds, and show the slabbed multi-tree scheme shrinks it
    (Multinomial(n1,p)+Multinomial(n2,p) = Multinomial(n1+n2,p))."""
    sorb, noa, nob = 12, 3, 3
    model = GraphMPSRNN(sorb, noa, nob, dcut=8)
    params = model.init(jax.random.PRNGKey(3))
    space = jnp.asarray(fci.fci_bits(sorb, noa, nob))
    lp = np.asarray(model.log_psi(params, space))
    p = np.exp(2 * lp[:, 0])
    p /= p.sum()

    n_sample = 100_000
    b1, c1, d1 = ar_sampling(
        model, params, jax.random.PRNGKey(0), n_sample, capacity=64
    )
    b8, c8, d8 = ar_sampling_slabbed(
        model, params, jax.random.PRNGKey(0), n_sample, capacity=64, n_slab=8
    )
    tv1 = _tv(model, params, space, p, b1, c1)
    tv8 = _tv(model, params, space, p, b8, c8)
    assert tv8 < tv1
    assert int(d8) <= int(d1)
    # dedup: live rows unique, counts conserved
    live = np.asarray(c8) > 0
    rows = np.asarray(b8)[live]
    assert len(np.unique(rows, axis=0)) == live.sum()
    assert int(np.asarray(c8).sum()) + int(d8) == n_sample
    # particle numbers preserved on every live row
    assert (rows[:, 0::2].sum(1) == noa).all()
    assert (rows[:, 1::2].sum(1) == nob).all()


def test_slabbed_equals_single_when_capacity_ample():
    """With no truncation anywhere both schemes sample the same law
    (not the same draws); compare via total-variation to exact."""
    sorb, noa, nob = 8, 2, 2
    model = GraphMPSRNN(sorb, noa, nob, dcut=6)
    params = model.init(jax.random.PRNGKey(5))
    space = jnp.asarray(fci.fci_bits(sorb, noa, nob))
    lp = np.asarray(model.log_psi(params, space))
    p = np.exp(2 * lp[:, 0])
    p /= p.sum()
    n = 200_000
    _, c1, d1 = ar_sampling(
        model, params, jax.random.PRNGKey(1), n, capacity=64
    )
    b4, c4, d4 = ar_sampling_slabbed(
        model, params, jax.random.PRNGKey(1), n, capacity=64, n_slab=4
    )
    assert int(d1) == 0 and int(d4) == 0
    tv = _tv(model, params, space, p, b4, c4)
    assert tv < 0.01, tv


def test_vmc_with_slabbed_sampler_runs_and_descends():
    """The production config path: ARSampler(n_slab>1) inside the
    jitted VMC step (dedup merge included)."""
    import optax
    from pynqs_tpu.optim.vmc import VMC, VMCConfig
    from pynqs_tpu.sampler import ARSampler
    from pynqs_tpu.utils import System

    sys = System.hubbard_1d(6, 2, 2, u=4.0)
    model = GraphMPSRNN(sys.sorb, sys.noa, sys.nob, dcut=8)
    samp = ARSampler(
        sys.sorb, sys.noa, sys.nob, n_sample=20_000, capacity=64, n_slab=4
    )
    vmc = VMC(
        model, sys, samp,
        VMCConfig(
            n_iter=40, optimizer=optax.adam(2e-2), eloc_method="reduce",
            eloc_k_det=16, eloc_n_stoch=8, log_every=10**6,
        ),
    )
    params, hist = vmc.run(jax.random.PRNGKey(0))
    assert np.isfinite(hist).all()
    assert np.mean(hist[-10:]) < np.mean(hist[:10])


def test_multinomial_partition_exact_beyond_f32_counts():
    """n_sample > 2^24: the f32 binomial cascade silently corrupts
    integer counts (VERDICT round-2 weak #5); the split-binomial path
    (max_count hint) must conserve counts exactly."""
    from pynqs_tpu.sampler.ar import multinomial_partition

    n = 50_000_017  # prime-ish, > 2^24, not a multiple of the splits
    logp = jnp.log(jnp.asarray([[0.53, 0.17, 0.2, 0.1]], jnp.float32))
    counts = jnp.asarray([n], jnp.int32)
    sub = multinomial_partition(
        jax.random.PRNGKey(3), counts, logp, max_count=n
    )
    assert int(sub.sum()) == n
    # marginals within 5 sigma of the multinomial expectation
    p = np.exp(np.asarray(logp))[0]
    se = np.sqrt(n * p * (1 - p))
    assert np.all(np.abs(np.asarray(sub[0]) - n * p) < 5 * se)


def test_ar_sampling_conserves_large_counts():
    """End-to-end: 3e7 draws through the tree sum exactly (no drops at
    ample capacity, no f32 count corruption at any step)."""
    model = GraphMPSRNN(8, 2, 2, dcut=4, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    n = 30_000_001
    bits, counts, dropped = ar_sampling(
        model, params, jax.random.PRNGKey(5), n, capacity=512
    )
    assert int(counts.sum()) + int(dropped) == n
    assert int(dropped) == 0


def test_dfs_sampling_exact_law_and_disjoint_groups():
    """ar_sampling_dfs: ample capacity → exact multinomial law; live
    rows globally unique across groups (disjoint prefixes)."""
    from pynqs_tpu.sampler.ar import ar_sampling_dfs

    sorb, noa, nob = 8, 2, 2
    model = GraphMPSRNN(sorb, noa, nob, dcut=6)
    params = model.init(jax.random.PRNGKey(5))
    space = jnp.asarray(fci.fci_bits(sorb, noa, nob))
    lp = np.asarray(model.log_psi(params, space))
    p = np.exp(2 * lp[:, 0])
    p /= p.sum()
    n = 200_000
    bd, cd, dd = ar_sampling_dfs(
        model, params, jax.random.PRNGKey(1), n,
        capacity=64, n_group=4, split_depth=2, capacity_root=32,
    )
    assert int(dd) == 0
    tv = _tv(model, params, space, p, bd, cd)
    assert tv < 0.01, tv
    live = np.asarray(cd) > 0
    rows = np.asarray(bd)[live]
    assert len(np.unique(rows, axis=0)) == live.sum()
    assert (rows[:, 0::2].sum(1) == noa).all()
    assert (rows[:, 1::2].sum(1) == nob).all()


def test_dfs_beats_single_tree_and_slabs_on_capacity_bias():
    """The DFS prefix partition must cut truncation loss below both the
    single tree AND the slabbed scheme at equal leaf capacity
    (VERDICT round-2 missing #1: dropped-mass ceiling)."""
    from pynqs_tpu.sampler.ar import ar_sampling_dfs

    sorb, noa, nob = 12, 3, 3
    model = GraphMPSRNN(sorb, noa, nob, dcut=8)
    params = model.init(jax.random.PRNGKey(3))
    n_sample = 100_000
    _, c1, d1 = ar_sampling(
        model, params, jax.random.PRNGKey(0), n_sample, capacity=64
    )
    _, c8, d8 = ar_sampling_slabbed(
        model, params, jax.random.PRNGKey(0), n_sample, capacity=64, n_slab=8
    )
    _, cd, dd = ar_sampling_dfs(
        model, params, jax.random.PRNGKey(0), n_sample,
        capacity=64, n_group=8, split_depth=3, capacity_root=64,
    )
    assert int(dd) < int(d1)
    assert int(dd) <= int(d8)
    assert int(np.asarray(cd).sum()) + int(dd) == n_sample


def test_dfs_auto_split_depth_within_2x_of_hand_tuned():
    """tune_dfs_split_depth (measured live-branch probe) must land
    within 2× of the best hand-scanned depth's dropped mass, and beat
    or match the old static bit-length heuristic."""
    from pynqs_tpu.sampler.ar import ar_sampling_dfs, tune_dfs_split_depth

    sorb, noa, nob = 12, 3, 3
    model = GraphMPSRNN(sorb, noa, nob, dcut=8)
    params = model.init(jax.random.PRNGKey(3))
    n_sample = 100_000
    kw = dict(capacity=64, n_group=8, capacity_root=64)

    def dropped_at(depth):
        _, _, d = ar_sampling_dfs(
            model, params, jax.random.PRNGKey(0), n_sample,
            split_depth=depth, **kw,
        )
        return int(d)

    hand = {d: dropped_at(d) for d in range(1, sorb // 2)}
    best = min(hand.values())
    auto = tune_dfs_split_depth(
        model, params, jax.random.PRNGKey(0), n_sample, **kw
    )
    assert 1 <= auto <= sorb // 2 - 1
    assert hand[auto] <= max(2 * best, best + max(2, n_sample // 10000)), (
        auto, hand,
    )
    # the old static default for this config
    static = max(1, min(sorb // 2 - 1, (64 .bit_length() - 1) // 2))
    assert hand[auto] <= hand[static], (auto, static, hand)


def test_compact_by_count_keeps_all_live_rows():
    from pynqs_tpu.sampler.ar import ar_sampling_dfs, compact_by_count

    sorb, noa, nob = 8, 2, 2
    model = GraphMPSRNN(sorb, noa, nob, dcut=6)
    params = model.init(jax.random.PRNGKey(5))
    bd, cd, _ = ar_sampling_dfs(
        model, params, jax.random.PRNGKey(2), 50_000,
        capacity=64, n_group=4, split_depth=2, capacity_root=32,
    )
    n_live = int((np.asarray(cd) > 0).sum())
    bc, cc = compact_by_count(bd, cd, n_live + 8)
    assert int(cc.sum()) == int(cd.sum())
    assert bc.shape[0] == n_live + 8


def test_vmc_with_dfs_sampler_runs_and_descends():
    """Production path: ARSampler(dfs_n_group>1, max_unique) inside the
    jitted VMC step with grad microbatching."""
    import optax
    from pynqs_tpu.optim.vmc import VMC, VMCConfig
    from pynqs_tpu.sampler import ARSampler
    from pynqs_tpu.utils import System

    sys = System.hubbard_1d(6, 2, 2, u=4.0)
    model = GraphMPSRNN(sys.sorb, sys.noa, sys.nob, dcut=8)
    samp = ARSampler(
        sys.sorb, sys.noa, sys.nob, n_sample=20_000, capacity=64,
        dfs_n_group=4, dfs_split_depth=2, dfs_capacity_root=32,
        max_unique=128,
    )
    vmc = VMC(
        model, sys, samp,
        VMCConfig(
            n_iter=40, optimizer=optax.adam(2e-2), eloc_method="reduce",
            eloc_k_det=16, eloc_n_stoch=8, log_every=10**6, grad_batch=64,
        ),
    )
    params, hist = vmc.run(jax.random.PRNGKey(0))
    assert np.isfinite(hist).all()
    assert np.mean(hist[-10:]) < np.mean(hist[:10])


def test_gumbel_sampling_without_replacement_unbiased():
    """Stochastic beam search (ar_sampling_gumbel): rows are distinct,
    and the threshold importance estimator (gumbel_importance_weights)
    reproduces E_p[f] within 5 SE over repeated draws."""
    from pynqs_tpu.sampler.ar import (
        ar_sampling_gumbel,
        gumbel_importance_weights,
    )

    sorb, noa, nob = 8, 2, 2
    model = GraphMPSRNN(sorb, noa, nob, dcut=6)
    params = model.init(jax.random.PRNGKey(2))
    space = fci.fci_bits(sorb, noa, nob)
    lp = np.asarray(model.log_psi(params, jnp.asarray(space)))
    p = np.exp(2 * lp[:, 0])
    p = p / p.sum()
    # observable: f(n) = number of alpha electrons in the first 2 sites
    def f_np(b):
        return b[:, 0] + b[:, 2]

    target = float((p * f_np(np.asarray(space))).sum())

    C = 6  # < |space|, so the beam truncates
    @jax.jit
    def one(key):
        bits, logq, G, alive = ar_sampling_gumbel(model, params, key, C)
        w, keep = gumbel_importance_weights(logq, G, alive)
        fv = (bits[:, 0] + bits[:, 2]).astype(jnp.float64)
        return (w * fv).sum(), w.sum()

    keys = jax.random.split(jax.random.PRNGKey(11), 400)
    num, den = jax.lax.map(one, keys)
    num, den = np.asarray(num), np.asarray(den)
    # unnormalized estimator is exactly unbiased for sum_i p_i f_i
    se = num.std() / np.sqrt(len(keys))
    assert abs(num.mean() - target) < 5 * se + 1e-9, (num.mean(), target, se)
    # total-mass estimator is unbiased for 1
    se_d = den.std() / np.sqrt(len(keys))
    assert abs(den.mean() - 1.0) < 5 * se_d + 1e-9, (den.mean(), se_d)

    # distinctness of live rows in one draw
    bits, logq, G, alive = ar_sampling_gumbel(
        model, params, jax.random.PRNGKey(5), C
    )
    live = np.asarray(bits)[np.asarray(alive)]
    assert len({tuple(r) for r in live}) == len(live)


def test_gumbel_importance_weights_f32_no_overflow():
    """f32 path of gumbel_importance_weights: a leaf with logq far below
    the threshold must give a finite weight (the old 1e-300 floor
    underflows to 0.0 in f32 -> inf), and the weights must match an
    f64 direct evaluation of Kool et al. eq. 14."""
    from pynqs_tpu.sampler.ar import gumbel_importance_weights

    # leaf 3 (logq=-80) is kept with G far above the threshold kappa=-2:
    # its p_gt = -expm1(-exp(-78)) underflows f32 expm1 to 0 exactly,
    # so the old exp(logq)/max(p_gt, 1e-300) path returned inf.
    logq64 = np.array([-0.5, -3.0, -40.0, -80.0, -1.0])
    G64 = np.array([2.0, 1.0, 0.5, 0.9, -2.0])  # last = threshold leaf
    alive = np.array([True] * 5)

    w32, keep32 = gumbel_importance_weights(
        jnp.asarray(logq64, jnp.float32),
        jnp.asarray(G64, jnp.float32),
        jnp.asarray(alive),
    )
    w32 = np.asarray(w32)
    assert np.isfinite(w32).all(), w32
    assert w32[-1] == 0.0  # threshold leaf dropped

    # f64 oracle: w = p / (1 - exp(-exp(logq - kappa)))
    kappa = G64[alive].min()
    p_gt = -np.expm1(-np.exp(logq64 - kappa))
    w64 = np.where(G64 > kappa, np.exp(logq64) / np.maximum(p_gt, 1e-300), 0.0)
    keep = np.asarray(keep32)
    np.testing.assert_allclose(w32[keep], w64[keep], rtol=2e-4)


def test_vmc_segmax_selection_gradient_unbiased():
    """Gradient-quality gate for eloc_topk='segmax' (the sort-free
    production/bench selection, PERF.md round-3 -12 ms): the covariance
    gradient is LINEAR in the per-sample eloc vector, so an unbiased
    eloc estimator gives an unbiased gradient — verify E_keys[g(segmax
    REDUCE eloc)] == g(SIMPLE exact eloc) on a DENSE-Hij system (random
    molecular-type integrals; Hubbard is too sparse — k_det covers
    every nonzero term and the test would be vacuous)."""
    from functools import partial

    from pynqs_tpu.energy.eloc import local_energy_reduce, local_energy_simple
    from pynqs_tpu.grad.energy_grad import energy_and_grad
    from pynqs_tpu.models.rbm import RBM
    from pynqs_tpu.ops.integrals import triangle_size
    from pynqs_tpu.utils import System

    rng = np.random.default_rng(11)
    sorb = 8
    h1e = rng.standard_normal((sorb, sorb)) * 0.2
    h1e = (h1e + h1e.T) / 2
    h2e = rng.standard_normal(triangle_size(sorb)) * 0.05
    sys = System.from_integrals(h1e, h2e, sorb, 2, 2, dtype=np.float64)
    model = RBM(sorb=sorb, alpha=2, param_type="complex")
    params = model.init(jax.random.PRNGKey(0))
    space = jnp.asarray(fci.fci_bits(sorb, 2, 2))
    bits = space[:24]
    w = jnp.full((24,), 1.0 / 24)
    fn = partial(model.log_psi, params)
    ops = [jnp.asarray(np.asarray(x)) for x in sys.tables.astuple()]

    k_det, n_stoch = 8, 16
    # non-vacuous: the deterministic set must NOT cover all nonzero |H|
    from pynqs_tpu.ops.hamiltonian import comb_hij

    _, hij = comb_hij(bits, *ops, None, table=sys.excitation, with_comb=False)
    assert int((np.abs(np.asarray(hij))[:, 1:] > 1e-12).sum(1).min()) > k_det

    def flat_grad(eloc):
        _, g, _ = energy_and_grad(model, params, bits, w, eloc)
        return np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(g)])

    g_ref = flat_grad(
        local_energy_simple(fn, bits, ops, sys.excitation)
    )

    @jax.jit
    def one(key):
        return local_energy_reduce(
            fn, bits, ops, sys.excitation, key,
            k_det=k_det, n_stoch=n_stoch, topk="segmax",
        )

    keys = jax.random.split(jax.random.PRNGKey(5), 200)
    gs = np.stack([flat_grad(one(k)) for k in keys])
    # segmax must actually differ from SIMPLE per draw (non-vacuous)
    assert np.abs(gs - g_ref).max() > 1e-8
    mean, se = gs.mean(0), gs.std(0) / np.sqrt(len(keys))
    assert (np.abs(mean - g_ref) < 5 * se + 1e-9).all(), (
        np.abs(mean - g_ref).max(), se.max())


def test_vmc_rebalanced_kn_gradient_unbiased():
    """Round-4 k-rebalance gate (VERDICT #3): the bench/production
    REDUCE config moves from (k_det, n_stoch) = (512, 128) to
    (256, 64) — HALF the ψ forwards per sample.  Any deterministic
    top set + the ∝|H| tail draw is unbiased at ANY (k, n), but the
    adoption gate is quantitative: at the flagship's coverage ratio
    (k_det/n_sd ≈ 3%, n_stoch = k/4) the covariance GRADIENT must
    match SIMPLE within Monte-Carlo error, and halving (k, n) must
    not blow up the energy-estimator spread (≤ 3× — it is ~√2×
    analytically since tail variance ∝ S²/n)."""
    from functools import partial

    from pynqs_tpu.energy.eloc import local_energy_reduce, local_energy_simple
    from pynqs_tpu.grad.energy_grad import energy_and_grad
    from pynqs_tpu.models.rbm import RBM
    from pynqs_tpu.ops.integrals import triangle_size
    from pynqs_tpu.utils import System

    rng = np.random.default_rng(23)
    sorb = 12
    h1e = rng.standard_normal((sorb, sorb)) * 0.2
    h1e = (h1e + h1e.T) / 2
    h2e = rng.standard_normal(triangle_size(sorb)) * 0.05
    sys = System.from_integrals(h1e, h2e, sorb, 3, 3, dtype=np.float64)
    model = RBM(sorb=sorb, alpha=2, param_type="complex")
    params = model.init(jax.random.PRNGKey(2))
    space = jnp.asarray(fci.fci_bits(sorb, 3, 3))
    bits = space[:32]
    w = jnp.full((32,), 1.0 / 32)
    fn = partial(model.log_psi, params)
    ops = [jnp.asarray(np.asarray(x)) for x in sys.tables.astuple()]

    n_sd = sys.excitation.n_sd
    k_det = max(8, int(0.03 * n_sd))  # flagship coverage ratio ~3%
    n_stoch = max(4, k_det // 4)

    def flat_grad(eloc):
        _, g, _ = energy_and_grad(model, params, bits, w, eloc)
        return np.concatenate(
            [np.asarray(x).ravel() for x in jax.tree.leaves(g)]
        )

    g_ref = flat_grad(local_energy_simple(fn, bits, ops, sys.excitation))

    def make_one(kd, ns):
        @jax.jit
        def one(key):
            return local_energy_reduce(
                fn, bits, ops, sys.excitation, key,
                k_det=kd, n_stoch=ns, topk="segmax",
            )
        return one

    keys = jax.random.split(jax.random.PRNGKey(7), 200)
    one = make_one(k_det, n_stoch)
    gs = np.stack([flat_grad(one(k)) for k in keys])
    assert np.abs(gs - g_ref).max() > 1e-8  # non-vacuous
    mean, se = gs.mean(0), gs.std(0) / np.sqrt(len(keys))
    assert (np.abs(mean - g_ref) < 5 * se + 1e-9).all(), (
        np.abs(mean - g_ref).max(), se.max())

    # energy-spread inflation of the HALVED config is bounded
    def e_spread(kd, ns, nk=64):
        f = make_one(kd, ns)
        es = [
            float((np.asarray(w) * np.asarray(f(k))[:, 0]).sum())
            for k in jax.random.split(jax.random.PRNGKey(9), nk)
        ]
        return np.std(es)

    s_half = e_spread(k_det, n_stoch)
    s_full = e_spread(2 * k_det, 2 * n_stoch)
    assert s_half < 3.0 * s_full + 1e-12, (s_half, s_full)
