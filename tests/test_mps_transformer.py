"""MPS-Transformer (MPSDecoder): normalization + sampling + step parity."""

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from pynqs_tpu.models.mps_transformer import MPSDecoder
from pynqs_tpu.sampler.ar import ar_sampling
from pynqs_tpu.utils import fci


@pytest.mark.parametrize("pmode", ["element", "linear", "conv", "spm"])
def test_mpsdecoder_normalized_and_sampling_matches(pmode):
    sorb, noa, nob = 8, 2, 2
    model = MPSDecoder(sorb, noa, nob, dcut=5, n_layer=1, n_head=2,
                       d_model=16, pmode=pmode)
    params = model.init(jax.random.PRNGKey(0))
    space = fci.fci_bits(sorb, noa, nob)
    lp = model.log_psi(params, jnp.asarray(space))
    p = np.exp(2 * np.asarray(lp[..., 0]))
    assert abs(p.sum() - 1.0) < 1e-9, p.sum()

    n_sample = 400_000
    bits, counts, dropped = ar_sampling(
        model, params, jax.random.PRNGKey(3), n_sample, capacity=space.shape[0]
    )
    assert int(dropped) == 0
    freq = {}
    for row, c in zip(np.asarray(bits), np.asarray(counts)):
        if c:
            freq[tuple(row.tolist())] = c / n_sample
    tv = sum(
        abs(freq.get(tuple(r.tolist()), 0.0) - pi) for r, pi in zip(space, p)
    )
    assert tv < 0.02, f"total variation {tv}"


def test_mpsdecoder_ar_step_matches_forward_conditionals():
    sorb, noa, nob = 12, 3, 2
    model = MPSDecoder(sorb, noa, nob, dcut=4, n_layer=2, n_head=2, d_model=16)
    params = model.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    space = fci.fci_bits(sorb, noa, nob)
    rows = jnp.asarray(space[rng.integers(0, len(space), 6)])
    # forward per-block conditional log-probs (before symmetry mask)
    B = rows.shape[0]
    vals = (rows[:, 0::2] + 2 * rows[:, 1::2]).astype(jnp.int32)

    carry = model.ar_init(params, B)
    prev = jnp.zeros((B,), jnp.int32)
    # reference values via a manual forward replay of the same math
    import jax.numpy as jnp2

    lp_fwd = model.log_psi(params, rows)
    # consistency: product of stepped masked conditionals == |psi|^2
    from pynqs_tpu.sampler.symmetry import apply_mask_logp, mask_two_site

    used_a = jnp.zeros((B,), jnp.int32)
    used_b = jnp.zeros((B,), jnp.int32)
    acc = jnp.zeros((B,))
    nb = model.n_blocks
    for k in range(nb):
        logp, carry = model.ar_step(params, carry, k, prev)
        rem = nb - k - 1
        mask = mask_two_site(used_a, used_b, noa, nob, rem, rem)
        logp = apply_mask_logp(logp, mask)
        x = vals[:, k]
        acc = acc + jnp.take_along_axis(logp, x[:, None], -1)[:, 0]
        used_a = used_a + (x & 1)
        used_b = used_b + ((x >> 1) & 1)
        prev = x
    np.testing.assert_allclose(
        np.asarray(acc) * 0.5, np.asarray(lp_fwd[:, 0]), atol=1e-10
    )
