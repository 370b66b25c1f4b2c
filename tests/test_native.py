"""Native (C++/ctypes) host helpers vs the Python implementations."""

import numpy as np
import jax.numpy as jnp
import pytest

from pynqs_tpu import native
from pynqs_tpu.ops import onv
from pynqs_tpu.utils import fci


@pytest.mark.skipif(not native.available(), reason="no g++ toolchain")
def test_native_fci_space_matches_python():
    for sorb, noa, nob in [(8, 2, 2), (12, 3, 2), (10, 1, 4)]:
        ref = fci.fci_bits(sorb, noa, nob)
        got = native.fci_space_bits(sorb, noa, nob)
        np.testing.assert_array_equal(got, ref)


@pytest.mark.skipif(not native.available(), reason="no g++ toolchain")
def test_native_pack_matches_device_pack():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, size=(100, 70)).astype(np.int8)
    ref = np.asarray(onv.pack_bits(jnp.asarray(bits)))
    got = native.pack_bits_u32(bits)
    np.testing.assert_array_equal(got, ref)


def test_native_fci_space_medium():
    # C(10,5)^2 = 63504 dets, sorb=20 — python takes ~seconds, native ms
    got = native.fci_space_bits(20, 5, 5)
    assert got.shape == (63504, 20)
    assert (got[:, 0::2].sum(1) == 5).all()
    assert (got[:, 1::2].sum(1) == 5).all()
    # ascending packed order
    packed = native.pack_bits_u32(got) if native.available() else None
    if packed is not None:
        as_int = packed[:, 0].astype(np.uint64)
        assert (np.diff(as_int.astype(np.int64)) > 0).all()
