"""RESTRICTED (given-states) "sampler": deterministic optimization
over a fixed determinant set.

The reference's SampleMethod RESTRICTED (vmc/sample.py:83,
_init_restricted/restricted_sample :774-832): instead of drawing
samples, every determinant of a user-supplied set is evaluated and
weighted by its normalized |ψ|² within the set.  Useful for
deterministic optimization on a CI-selected space and for debugging
estimators on a fixed support.  The reference's det_lut pre-filter
(removing excluded determinants so |ψ| can't be pinned to zero) maps to
the optional ``exclude_sorted_keys``; its rank-split maps to the
mesh-sharded batch in the VMC step (GSPMD shards the leading axis).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["RestrictedSampler"]


@dataclass(frozen=True)
class RestrictedSampler:
    """``states``: [N, sorb] 0/1 determinants (any array-like)."""

    sorb: int
    noa: int
    nob: int
    states: np.ndarray = field(default=None, repr=False)
    exclude_sorted_keys: object = None  # sorted packed ONVs to drop

    def __post_init__(self):
        st = np.asarray(self.states, np.int8)
        if st.ndim != 2 or st.shape[1] != self.sorb:
            raise ValueError(f"states must be [N, {self.sorb}]")
        na = st[:, 0::2].sum(1)
        nb = st[:, 1::2].sum(1)
        keep = (na == self.noa) & (nb == self.nob)
        st = st[keep]
        if self.exclude_sorted_keys is not None:
            from pynqs_tpu.ops import lut as _lut
            from pynqs_tpu.ops import onv as _onv

            _, member = _lut.lut_search(
                jnp.asarray(self.exclude_sorted_keys),
                _onv.pack_bits(jnp.asarray(st)),
            )
            st = st[~np.asarray(member)]
        if st.shape[0] == 0:
            raise ValueError("no states left after sector/exclusion filter")
        object.__setattr__(self, "states", st)

    @property
    def n_states(self) -> int:
        return self.states.shape[0]

    def init_state(self, key: jax.Array):
        return None

    def sample(self, model, params, key: jax.Array, state=None):
        """(bits [N, sorb], weights |ψ|²/Z over the set, log_psi, None)."""
        bits = jnp.asarray(self.states)
        lp = model.log_psi(params, bits)
        la = lp[..., 0]
        w = jnp.exp(2 * (la - jnp.max(la)))
        w = w / w.sum()
        return bits, jax.lax.stop_gradient(w), lp, None
