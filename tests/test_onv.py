"""ONV primitive tests against plain-python bit manipulation."""

import numpy as np
import jax.numpy as jnp

from pynqs_tpu.ops import onv


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    for sorb in [4, 14, 32, 63, 64, 65, 100, 130]:
        bits = rng.integers(0, 2, size=(7, sorb)).astype(np.int8)
        packed = onv.pack_bits(jnp.asarray(bits))
        assert packed.shape == (7, onv.n_words32(sorb))
        back = onv.unpack_bits(packed, sorb)
        np.testing.assert_array_equal(np.asarray(back), bits)
        # packed words agree with python ints
        for r in range(7):
            val = sum(int(b) << i for i, b in enumerate(bits[r]))
            got = sum(
                int(np.asarray(packed)[r, w]) << (32 * w)
                for w in range(packed.shape[-1])
            )
            assert val == got


def test_spins_roundtrip():
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, size=(5, 12)).astype(np.int8)
    spins = onv.bits_to_spins(jnp.asarray(bits))
    assert set(np.unique(np.asarray(spins))) <= {-1.0, 1.0}
    np.testing.assert_array_equal(
        np.asarray(onv.spins_to_bits(spins)), bits
    )


def test_prefix_and_parity():
    rng = np.random.default_rng(2)
    sorb = 20
    bits = rng.integers(0, 2, size=(9, sorb)).astype(np.int8)
    prefix = np.asarray(onv.prefix_occ(jnp.asarray(bits)))
    for r in range(9):
        det = sum(int(b) << i for i, b in enumerate(bits[r]))
        for p in range(sorb):
            below = bin(det & ((1 << p) - 1)).count("1")
            assert prefix[r, p] == below
    pos = rng.integers(0, sorb, size=(9,))
    par = np.asarray(onv.parity(jnp.asarray(prefix), jnp.asarray(pos)))
    for r in range(9):
        below = prefix[r, pos[r]]
        assert par[r] == (-1) ** below


def _merged_reference(bits, noa, nob):
    """Plain-python re-derivation of get_olst_vlst_ab_cpu semantics."""
    sorb = len(bits)
    occ_a = [s for s in range(0, sorb, 2) if bits[s]]
    vir_a = [s for s in range(0, sorb, 2) if not bits[s]]
    occ_b = [s for s in range(1, sorb, 2) if bits[s]]
    vir_b = [s for s in range(1, sorb, 2) if not bits[s]]
    alpha = occ_a + vir_a
    beta = occ_b + vir_b
    merged = np.zeros(sorb, dtype=np.int32)
    merged[0::2] = alpha
    merged[1::2] = beta
    return merged


def test_merged_orbital_list():
    rng = np.random.default_rng(3)
    sorb, noa, nob = 12, 3, 2
    batch = []
    for _ in range(8):
        b = np.zeros(sorb, dtype=np.int8)
        b[2 * rng.choice(sorb // 2, noa, replace=False)] = 1
        b[2 * rng.choice(sorb // 2, nob, replace=False) + 1] = 1
        batch.append(b)
    bits = np.stack(batch)
    merged = np.asarray(
        onv.merged_orbital_list(jnp.asarray(bits), noa, nob)
    )
    for r in range(8):
        np.testing.assert_array_equal(
            merged[r], _merged_reference(bits[r], noa, nob)
        )


def test_popcount_u32():
    rng = np.random.default_rng(4)
    x = rng.integers(0, 2**32, size=100, dtype=np.uint32)
    got = np.asarray(onv.popcount_u32(jnp.asarray(x)))
    want = np.array([bin(int(v)).count("1") for v in x])
    np.testing.assert_array_equal(got, want)


def test_key_compare():
    rng = np.random.default_rng(5)
    a = rng.integers(0, 2**32, size=(50, 2), dtype=np.uint32)
    b = rng.integers(0, 2**32, size=(50, 2), dtype=np.uint32)
    lt = np.asarray(onv.compare_keys_lt(jnp.asarray(a), jnp.asarray(b)))
    le = np.asarray(onv.compare_keys_le(jnp.asarray(a), jnp.asarray(b)))
    for r in range(50):
        av = int(a[r, 0]) + (int(a[r, 1]) << 32)
        bv = int(b[r, 0]) + (int(b[r, 1]) << 32)
        assert lt[r] == (av < bv)
        assert le[r] == (av <= bv)


def test_hf_bits():
    bits = onv.hf_bits(10, 2, 1)
    assert bits.tolist() == [1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
