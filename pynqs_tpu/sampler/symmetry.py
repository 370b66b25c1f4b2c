"""(N, Sz) particle-number symmetry masks for autoregressive sampling.

The reference builds a 16-entry lookup chart on device
(`constrain_make_charts`, cpp_src/cuda/kernel.cu:538-651, used by
vmc/ansatz/symmetry.py:20-103).  The chart is just the closed-form
feasibility condition, so here it is computed directly with vector ops:

For a spin channel with target electron count N, ``used`` electrons
placed so far and ``remaining`` sites of that channel still to come
*after* the current one:

    occupy allowed  <=>  used + 1 <= N
    empty  allowed  <=>  N - used <= remaining

Sites are interleaved alpha/beta (even/odd spin orbitals); the 2-site
step decides one alpha and one beta orbital at once with the 4-way
basis ordering (a, b) in {(0,0), (0,1), (1,0), (1,1)} encoded as
v = a + 2*b  — bit 0 = alpha occupation, bit 1 = beta occupation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["mask_one_site", "mask_two_site", "NEG_INF"]

NEG_INF = -1e30


def _channel_mask(used, n_target: int, remaining: int):
    """(occupy_ok, empty_ok) boolean arrays for one channel."""
    occ_ok = used + 1 <= n_target
    emp_ok = n_target - used <= remaining
    return occ_ok, emp_ok


def mask_one_site(used_ch: jax.Array, n_target: int, remaining: int) -> jax.Array:
    """[..., 2] bool: allowed (empty, occupied) for the current site.

    used_ch: electrons already placed in this site's spin channel.
    remaining: channel sites after this one (static per step).
    """
    occ_ok, emp_ok = _channel_mask(used_ch, n_target, remaining)
    return jnp.stack([emp_ok, occ_ok], axis=-1)


def mask_two_site(
    used_a: jax.Array,
    used_b: jax.Array,
    noa: int,
    nob: int,
    remaining_a: int,
    remaining_b: int,
) -> jax.Array:
    """[..., 4] bool mask over v = a + 2b two-site occupations."""
    occ_a, emp_a = _channel_mask(used_a, noa, remaining_a)
    occ_b, emp_b = _channel_mask(used_b, nob, remaining_b)
    return jnp.stack(
        [
            emp_a & emp_b,  # v=0: (0,0)
            occ_a & emp_b,  # v=1: (1,0)
            emp_a & occ_b,  # v=2: (0,1)
            occ_a & occ_b,  # v=3: (1,1)
        ],
        axis=-1,
    )


def apply_mask_logp(logp: jax.Array, mask: jax.Array) -> jax.Array:
    """Mask + renormalize log-probabilities along the last axis."""
    masked = jnp.where(mask, logp, NEG_INF)
    return masked - jax.scipy.special.logsumexp(masked, axis=-1, keepdims=True)
