"""AR sampler conforming to the VMC sampler interface.

The reference's Sampler AR mode (vmc/sample.py:446-625) with the
fixed-capacity tree driver; weights are the exact multinomial counts
normalized (probability measure over unique determinants).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from pynqs_tpu.sampler.ar import ar_sampling

__all__ = ["ARSampler"]


@dataclass(frozen=True)
class ARSampler:
    sorb: int
    noa: int
    nob: int
    n_sample: int = 1 << 12
    capacity: int = 1 << 10  # max unique determinants carried

    def init_state(self, key: jax.Array):
        return None

    def sample(self, model, params, key: jax.Array, state=None):
        bits, counts, _dropped = ar_sampling(
            model, params, key, self.n_sample, capacity=self.capacity
        )
        lp = model.log_psi(params, bits)  # [C, 2] pair
        w = counts.astype(lp.dtype) / jnp.maximum(counts.sum(), 1)
        return bits, w, lp, None
