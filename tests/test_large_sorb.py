"""> 64 spin-orbital support: multi-word ONVs, LUT, Hij, dcut growth.

The reference compiles per MAX_SORB_LEN (1-3 uint64 words, ≤ 192
orbitals, cpp_src/common/default.h); here word count is just a shape.
"""

import numpy as np
import jax
import jax.numpy as jnp

from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN
from pynqs_tpu.ops import lut, onv
from pynqs_tpu.ops.integrals import triangle_size
from pynqs_tpu.utils import System
from pynqs_tpu.utils.mps_import import grow_dcut


def test_pack_roundtrip_and_lut_76_orbitals():
    rng = np.random.default_rng(0)
    sorb = 76  # 3 uint32 words... (76+31)//32 = 3
    bits = rng.integers(0, 2, size=(300, sorb)).astype(np.int8)
    packed = onv.pack_bits(jnp.asarray(bits))
    assert packed.shape == (300, 3)
    back = onv.unpack_bits(packed, sorb)
    np.testing.assert_array_equal(np.asarray(back), bits)

    # sort + search over 3-word keys
    uniq_rows = np.unique(bits, axis=0)
    keys = onv.pack_bits(jnp.asarray(uniq_rows))
    sk, _ = lut.sort_onv(keys, jnp.zeros(keys.shape[0]))
    idx, found = lut.lut_search(sk, packed)
    assert bool(found.all())
    got = np.asarray(jnp.take(sk, idx, axis=0))
    np.testing.assert_array_equal(got, np.asarray(packed))


def test_hij_diagonal_matches_oracle_76():
    import sys as _s

    _s.path.insert(0, "tests")
    import oracle

    rng = np.random.default_rng(1)
    sorb, noa, nob = 76, 3, 2
    h1e = rng.standard_normal((sorb, sorb)) * 0.05
    h1e = (h1e + h1e.T) / 2
    h2e_c = rng.standard_normal(triangle_size(sorb)) * 0.01
    sys = System.from_integrals(h1e, h2e_c, sorb, noa, nob)
    from pynqs_tpu.ops.hamiltonian import comb_hij

    hf = onv.hf_bits(sorb, noa, nob)
    bits = jnp.asarray(hf[None, :])
    comb, hij = comb_hij(
        bits, *sys.tables.astuple(), sys.tables.hpair,
        table=sys.excitation, with_comb=True,
    )
    # diagonal vs independent oracle on the integer bitmask
    det = int(sum(1 << s for s in range(sorb) if hf[s]))
    from pynqs_tpu.ops.integrals import h2e_element

    # oracle diagonal: sum_occ h1e[p,p] + 1/2 sum_{pq occ} <pq||pq>
    occ = [s for s in range(sorb) if hf[s]]
    e_ref = sum(h1e[p, p] for p in occ)
    for p in occ:
        for q in occ:
            e_ref += 0.5 * float(h2e_element(h2e_c, p, q, p, q))
    np.testing.assert_allclose(float(hij[0, 0]), e_ref, atol=1e-9)


def test_grow_dcut_preserves_wavefunction():
    small = GraphMPSRNN(sorb=8, noa=2, nob=2, dcut=4)
    big = GraphMPSRNN(sorb=8, noa=2, nob=2, dcut=8)
    p_small = small.init(jax.random.PRNGKey(0))
    p_big = grow_dcut(p_small, small, big)
    from pynqs_tpu.utils import fci

    space = jnp.asarray(fci.fci_bits(8, 2, 2))
    lp_s = small.log_psi(p_small, space)
    lp_b = big.log_psi(p_big, space)
    # zero-padded params represent the same wavefunction
    np.testing.assert_allclose(
        np.asarray(lp_s[..., 0]), np.asarray(lp_b[..., 0]), atol=1e-9
    )
