"""Slater–Condon kernels vs. the independent second-quantization oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from pynqs_tpu.ops import integrals, onv
from pynqs_tpu.ops.excitation import (
    excitation_table,
    num_singles_doubles,
)
from pynqs_tpu.ops.hamiltonian import comb_hij, hij_dense, hij_pairs

import oracle


def _random_system(sorb, seed=0):
    rng = np.random.default_rng(seed)
    h1e = rng.standard_normal((sorb, sorb))
    h1e = (h1e + h1e.T) / 2
    h2e_dense = oracle.random_antisym_h2e(sorb, rng)
    return h1e, h2e_dense


def _tables(h1e, h2e_dense, sorb):
    h2e_c = integrals.compress_h2e(h2e_dense, sorb)
    t = integrals.precompute_hij_tables(h1e, h2e_c, sorb)
    return tuple(
        jnp.asarray(x) for x in (t.h1e, t.h2e, t.diag1, t.K, t.J)
    )


def test_compress_roundtrip():
    sorb = 8
    _, h2e_dense = _random_system(sorb)
    c = integrals.compress_h2e(h2e_dense, sorb)
    assert c.shape[0] == integrals.triangle_size(sorb)
    back = integrals.decompress_h2e(c, sorb)
    np.testing.assert_allclose(back, h2e_dense, atol=1e-12)


def test_hij_dense_vs_oracle():
    sorb, noa, nob = 8, 2, 2
    h1e, h2e_dense = _random_system(sorb)
    dets = oracle.fci_space(sorb, noa, nob)
    H = oracle.dense_h(dets, h1e, h2e_dense)
    bits = np.stack([oracle.det_to_bits(d, sorb) for d in dets])
    ops = _tables(h1e, h2e_dense, sorb)
    got = np.asarray(hij_dense(jnp.asarray(bits), jnp.asarray(bits), *ops))
    np.testing.assert_allclose(got, H, atol=1e-10)


def test_comb_hij_vs_oracle():
    sorb, noa, nob = 10, 2, 3
    nele = noa + nob
    h1e, h2e_dense = _random_system(sorb, seed=3)
    ops = _tables(h1e, h2e_dense, sorb)
    table = excitation_table(sorb, noa, nob)
    ns, nd, nsd = num_singles_doubles(sorb, noa, nob)
    assert table.n_sd == nsd

    dets = oracle.fci_space(sorb, noa, nob)
    rng = np.random.default_rng(7)
    sample = rng.choice(len(dets), size=12, replace=False)
    bits = np.stack([oracle.det_to_bits(dets[i], sorb) for i in sample])

    comb, hij = comb_hij(jnp.asarray(bits), *ops, table=table)
    comb = np.asarray(comb)
    hij = np.asarray(hij)
    assert comb.shape == (12, nsd + 1, sorb)
    assert hij.shape == (12, nsd + 1)

    index = {d: i for i, d in enumerate(dets)}
    H = oracle.dense_h(dets, h1e, h2e_dense)
    for r in range(12):
        n_idx = index[oracle.bits_to_det(bits[r])]
        seen = set()
        for c in range(nsd + 1):
            d2 = oracle.bits_to_det(comb[r, c])
            # particle numbers conserved
            assert bin(d2 & 0x55555555555555555555)[2:].count("1") or noa == 0
            m_idx = index[d2]
            np.testing.assert_allclose(
                hij[r, c], H[n_idx, m_idx], atol=1e-10,
                err_msg=f"row {r} comb {c}",
            )
            seen.add(d2)
        # identity + all SD excitations are distinct
        assert len(seen) == nsd + 1
        # completeness: every nonzero H element of this column is covered
        nonzero = {dets[i] for i in np.nonzero(np.abs(H[:, n_idx]) > 1e-12)[0]}
        assert nonzero <= seen


def test_hij_pairs_degrees():
    """Degree >2 pairs give exactly zero; degree 0/1/2 match oracle."""
    sorb, noa, nob = 8, 2, 2
    h1e, h2e_dense = _random_system(sorb, seed=11)
    ops = _tables(h1e, h2e_dense, sorb)
    dets = oracle.fci_space(sorb, noa, nob)
    bits = np.stack([oracle.det_to_bits(d, sorb) for d in dets])
    H = oracle.dense_h(dets, h1e, h2e_dense)
    rng = np.random.default_rng(13)
    ii = rng.integers(0, len(dets), 200)
    jj = rng.integers(0, len(dets), 200)
    got = np.asarray(
        hij_pairs(jnp.asarray(bits[ii]), jnp.asarray(bits[jj]), *ops)
    )
    np.testing.assert_allclose(got, H[ii, jj], atol=1e-10)


def test_hubbard_fci_energy():
    """4-site half-filled Hubbard FCI via our integrals vs oracle eigh."""
    nsites, t, u = 4, 1.0, 4.0
    hcore, eri = integrals.hubbard_1d(nsites, t, u)
    sorb = 2 * nsites
    h1e, h2e_c = integrals.spin_orbital_from_spatial(hcore, eri)
    h2e_dense = integrals.decompress_h2e(h2e_c, sorb)
    # antisymmetrized dense from the direct small-system route agrees
    h2e_dense2 = integrals.antisymmetrize_spin_h2e(eri)
    np.testing.assert_allclose(h2e_dense, h2e_dense2, atol=1e-12)

    dets = oracle.fci_space(sorb, 2, 2)
    H = oracle.dense_h(dets, h1e, h2e_dense)
    e0 = np.linalg.eigvalsh(H)[0]

    # cross-check: dense H from our kernels has the same ground state
    bits = np.stack([oracle.det_to_bits(d, sorb) for d in dets])
    ops = tuple(
        jnp.asarray(x)
        for x in (
            lambda T: (T.h1e, T.h2e, T.diag1, T.K, T.J)
        )(integrals.precompute_hij_tables(h1e, h2e_c, sorb))
    )
    Hj = np.asarray(hij_dense(jnp.asarray(bits), jnp.asarray(bits), *ops))
    e0j = np.linalg.eigvalsh(Hj)[0]
    np.testing.assert_allclose(e0j, e0, atol=1e-10)
    # physical sanity: E0 of 4-site U/t=4 Hubbard chain (open) is negative
    assert e0 < 0


def test_spin_raising_expectation():
    """<S-S+> penalty operator: zero on singlet-paired closed-shell HF."""
    sorb, noa, nob = 8, 2, 2
    h1e_s, h2e_s = integrals.spin_raising(sorb)
    h2e_dense = integrals.decompress_h2e(h2e_s, sorb)
    dets = oracle.fci_space(sorb, noa, nob)
    Hs = oracle.dense_h(dets, h1e_s, h2e_dense)
    # S-S+ = S² - Sz² - Sz is positive semidefinite on Sz=0 sector
    evals = np.linalg.eigvalsh(Hs)
    assert evals.min() > -1e-10
    # exact spectrum on Sz=0: S(S+1) for S=0,1,2 — {0, 2, 6}
    assert set(np.round(evals, 8)) <= {0.0, 2.0, 6.0}
    # closed-shell HF det (doubly occupied lowest orbitals) is a singlet
    hf = oracle.bits_to_det(onv.hf_bits(sorb, noa, nob))
    i = dets.index(hf)
    # HF singlet: S-S+|HF> has zero diagonal? <HF|S-S+|HF> = 0 for RHF singlet
    np.testing.assert_allclose(Hs[i, i], 0.0, atol=1e-10)


def test_comb_hij_hpair_f32_split_matches_triangle_gather():
    """The f32 hpair doubles path (bf16 one-hots × 3-way bf16-split
    integral side, f32 accumulation) must be f32-faithful: compare
    against the exact flat triangle gather on the same f32 system."""
    from pynqs_tpu.utils import System
    from pynqs_tpu.ops.integrals import triangle_size

    rng = np.random.default_rng(21)
    sorb, noa, nob = 12, 3, 3
    h1e = rng.standard_normal((sorb, sorb)) * 0.3
    h1e = (h1e + h1e.T) / 2
    h2e_c = rng.standard_normal(triangle_size(sorb)) * 0.2
    sys = System.from_integrals(h1e, h2e_c, sorb, noa, nob, dtype=np.float32)
    assert sys.tables.hpair is not None
    table = sys.excitation
    ops = tuple(jnp.asarray(np.asarray(x)) for x in sys.tables.astuple())
    hp = jnp.asarray(np.asarray(sys.tables.hpair))
    assert ops[0].dtype == jnp.float32

    space = oracle.fci_space(sorb, noa, nob)
    pick = rng.choice(len(space), size=16, replace=False)
    bits = jnp.asarray(
        np.stack([oracle.det_to_bits(space[i], sorb) for i in pick])
    )
    _, hij_gather = comb_hij(bits, *ops, None, table=table, with_comb=False)
    _, hij_split = comb_hij(bits, *ops, hp, table=table, with_comb=False)
    a, b = np.asarray(hij_gather), np.asarray(hij_split)
    scale = np.abs(a).max()
    assert np.abs(a - b).max() < 2e-6 * scale, np.abs(a - b).max()


def test_comb_hij_f32_onehot_paths_match_f64():
    """The whole f32 comb_hij (bf16 one-hot pm re-index, split-precision
    singles pickup, split-precision hpair doubles) vs the f64 reference
    path on the same integrals: f32-faithful matrix elements."""
    from pynqs_tpu.utils import System
    from pynqs_tpu.ops.integrals import triangle_size

    rng = np.random.default_rng(33)
    sorb, noa, nob = 12, 4, 3
    h1e = rng.standard_normal((sorb, sorb)) * 0.4
    h1e = (h1e + h1e.T) / 2
    h2e_c = rng.standard_normal(triangle_size(sorb)) * 0.15
    s32 = System.from_integrals(h1e, h2e_c, sorb, noa, nob, dtype=np.float32)
    s64 = System.from_integrals(h1e, h2e_c, sorb, noa, nob, dtype=np.float64)
    space = oracle.fci_space(sorb, noa, nob)
    pick = rng.choice(len(space), size=20, replace=False)
    bits = jnp.asarray(
        np.stack([oracle.det_to_bits(space[i], sorb) for i in pick])
    )

    def run(sys):
        ops = tuple(jnp.asarray(np.asarray(x)) for x in sys.tables.astuple())
        hp = (None if sys.tables.hpair is None
              else jnp.asarray(np.asarray(sys.tables.hpair)))
        _, hij = comb_hij(bits, *ops, hp, table=sys.excitation,
                          with_comb=False)
        return np.asarray(hij, np.float64)

    a, b = run(s64), run(s32)
    scale = np.abs(a).max()
    assert np.abs(a - b).max() < 2e-6 * scale, np.abs(a - b).max()


def test_comb_hij_pallas_pair_select_parity():
    """The Pallas VMEM pair-selection (ops/pallas_hij.py, interpret
    mode on CPU) must reproduce the XLA one-hot doubles path
    element-for-element (same 3-split f32-faithful scheme; T rows are
    exact f32 so the kernel can only be MORE accurate)."""
    import jax.numpy as jnp

    from pynqs_tpu.ops.hamiltonian import comb_hij
    from pynqs_tpu.ops.integrals import triangle_size
    from pynqs_tpu.utils import System, fci

    rng = np.random.default_rng(9)
    sorb = 12
    h1e = rng.standard_normal((sorb, sorb)) * 0.2
    h1e = (h1e + h1e.T) / 2
    h2e = rng.standard_normal(triangle_size(sorb)) * 0.05
    sys32 = System.from_integrals(h1e, h2e, sorb, 4, 3, dtype=np.float32)
    sys64 = System.from_integrals(h1e, h2e, sorb, 4, 3, dtype=np.float64)
    bits = jnp.asarray(fci.fci_bits(sorb, 4, 3))[:32]
    ops32 = [jnp.asarray(np.asarray(x)) for x in sys32.tables.astuple()]
    hp32 = jnp.asarray(np.asarray(sys32.tables.hpair))
    _, hij_p = comb_hij(
        bits, *ops32, hp32, table=sys32.excitation, with_comb=False,
        pair_select="pallas_interpret",
    )
    _, hij_x = comb_hij(
        bits, *ops32, hp32, table=sys32.excitation, with_comb=False,
        pair_select="xla",
    )
    ops64 = [jnp.asarray(np.asarray(x)) for x in sys64.tables.astuple()]
    _, hij_64 = comb_hij(
        bits, *ops64, None, table=sys64.excitation, with_comb=False,
    )
    a_p = np.asarray(hij_p, np.float64)
    a_x = np.asarray(hij_x, np.float64)
    a_r = np.asarray(hij_64)
    assert np.abs(a_p - a_r).max() <= np.abs(a_x - a_r).max() + 1e-7
    assert np.abs(a_p - a_r).max() < 5e-6, np.abs(a_p - a_r).max()


def test_hpair_cross_sector_zero_and_block_coverage():
    """For an Sz-conserving operator (any spatial-integral H) every
    cross-sector entry of the dense pair matrix is exactly zero, the
    three sectors partition the pair space, and the (aa, bb, ab)
    blocks equal the corresponding Hpair submatrices.  (The sector
    doubles PATH is exact for arbitrary h2e regardless — SD doubles
    are Sz-conserving and never reference cross-sector entries; see
    test_comb_hij_sector_blocks_match_dense with random h2e.)"""
    from pynqs_tpu.ops.integrals import sector_pair_index
    from pynqs_tpu.utils import System

    norb = 5
    sorb = 2 * norb
    rng = np.random.default_rng(5)
    hcore = rng.standard_normal((norb, norb))
    hcore = (hcore + hcore.T) / 2
    eri = rng.standard_normal((norb,) * 4)
    # chemist-notation 8-fold symmetry
    eri = eri + eri.transpose(1, 0, 2, 3)
    eri = eri + eri.transpose(0, 1, 3, 2)
    eri = eri + eri.transpose(2, 3, 0, 1)
    sys = System.from_spatial(hcore, eri, 2, 2)
    from pynqs_tpu.ops.integrals import precompute_hij_tables

    t = precompute_hij_tables(sys.h1e, sys.h2e, sorb)
    idx = sector_pair_index(sorb)
    npair = t.Hpair.shape[0]
    # the three sectors partition the pair space
    allidx = np.concatenate(idx)
    assert len(allidx) == npair and len(np.unique(allidx)) == npair
    sec_of = np.empty(npair, np.int64)
    for s, ix in enumerate(idx):
        sec_of[ix] = s
    cross = sec_of[:, None] != sec_of[None, :]
    assert np.abs(t.Hpair[cross]).max() == 0.0
    for s, ix in enumerate(idx):
        np.testing.assert_array_equal(
            t.Hpair_sect[s], t.Hpair[np.ix_(ix, ix)]
        )


def test_comb_hij_sector_blocks_match_dense():
    """The per-spin-sector doubles path (hpair as (H_aa, H_bb, H_ab))
    must reproduce the dense-hpair and triangle-gather paths exactly
    in f64 and f32-faithfully in f32 — all sectors exercised
    (noa != nob)."""
    from pynqs_tpu.utils import System
    from pynqs_tpu.ops.integrals import triangle_size

    rng = np.random.default_rng(17)
    sorb, noa, nob = 12, 4, 3
    h1e = rng.standard_normal((sorb, sorb)) * 0.3
    h1e = (h1e + h1e.T) / 2
    h2e_c = rng.standard_normal(triangle_size(sorb)) * 0.2
    space = oracle.fci_space(sorb, noa, nob)
    pick = rng.choice(len(space), size=16, replace=False)
    bits = jnp.asarray(
        np.stack([oracle.det_to_bits(space[i], sorb) for i in pick])
    )

    for np_dtype, tol in ((np.float64, 1e-12), (np.float32, 2e-6)):
        sys = System.from_integrals(
            h1e, h2e_c, sorb, noa, nob, dtype=np_dtype
        )
        assert sys.tables.hpair_sect is not None
        ops = tuple(jnp.asarray(np.asarray(x)) for x in sys.tables.astuple())
        hp = jnp.asarray(np.asarray(sys.tables.hpair))
        hps = tuple(jnp.asarray(np.asarray(b)) for b in sys.tables.hpair_sect)
        _, hij_gather = comb_hij(bits, *ops, None, table=sys.excitation,
                                 with_comb=False)
        _, hij_dense_p = comb_hij(bits, *ops, hp, table=sys.excitation,
                                  with_comb=False)
        _, hij_sect = comb_hij(bits, *ops, hps, table=sys.excitation,
                               with_comb=False)
        a = np.asarray(hij_gather, np.float64)
        s = np.asarray(hij_sect, np.float64)
        d = np.asarray(hij_dense_p, np.float64)
        scale = np.abs(a).max()
        assert np.abs(s - a).max() < tol * scale, np.abs(s - a).max()
        assert np.abs(s - d).max() < tol * scale, np.abs(s - d).max()


def test_comb_hij_sector_blocks_empty_sector():
    """Sector path with an empty same-spin sector (single virtual per
    channel -> no aa/bb doubles) and with noa < 2."""
    from pynqs_tpu.utils import System

    for sorb, noa, nob in ((8, 3, 3), (8, 1, 3)):
        sys = System.hubbard_1d(sorb // 2, noa, nob, u=4.0)
        if sys.tables.hpair_sect is None:
            continue
        ops = tuple(jnp.asarray(np.asarray(x)) for x in sys.tables.astuple())
        hps = tuple(jnp.asarray(np.asarray(b)) for b in sys.tables.hpair_sect)
        from pynqs_tpu.utils import fci

        bits = jnp.asarray(fci.fci_bits(sorb, noa, nob))[:12]
        _, hij_gather = comb_hij(bits, *ops, None, table=sys.excitation,
                                 with_comb=False)
        _, hij_sect = comb_hij(bits, *ops, hps, table=sys.excitation,
                               with_comb=False)
        np.testing.assert_allclose(
            np.asarray(hij_sect), np.asarray(hij_gather), atol=1e-10
        )
