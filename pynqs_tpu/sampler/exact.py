"""Exact-enumeration "sampler" over the full FCI space.

The reference's ``debug_exact`` mode (vmc/sample.py:357-396): every
determinant of the (noa, nob) sector is evaluated and weighted by its
normalized |ψ|².  Used as the optimization oracle in tests and for
small active spaces; the space is sharded across devices in the
distributed path (reference vmc/sample.py:994-1051).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from pynqs_tpu.utils import fci

__all__ = ["ExactSampler"]


@dataclass(frozen=True)
class ExactSampler:
    sorb: int
    noa: int
    nob: int
    _space: np.ndarray = field(default=None, repr=False)

    def __post_init__(self):
        if self._space is None:
            object.__setattr__(
                self, "_space", fci.fci_bits(self.sorb, self.noa, self.nob)
            )

    @property
    def n_states(self) -> int:
        return self._space.shape[0]

    def space(self) -> jax.Array:
        return jnp.asarray(self._space)

    def init_state(self, key: jax.Array):
        return None

    def sample(self, model, params, key: jax.Array, state=None):
        """Returns (bits [n_fci, sorb], weights [n_fci], log_psi, state).

        weights = |ψ|²/Z (stop-gradient), exact probability measure.
        """
        bits = self.space()
        lp = model.log_psi(params, bits)  # [n, 2] pair
        la = lp[..., 0]
        w = jnp.exp(2 * (la - jnp.max(la)))
        w = w / w.sum()
        return bits, jax.lax.stop_gradient(w), lp, None
