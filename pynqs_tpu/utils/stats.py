"""Probability-weighted Monte-Carlo statistics.

Reference: utils/stats/dist_stats.py (all-reduce weighted moments) +
mc_stats.py pretty printer.  Under SPMD the cross-device reduction is
just the global sum inside jit — no explicit collectives.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

__all__ = ["weighted_stats", "OperatorStats"]


@dataclass(frozen=True)
class OperatorStats:
    mean: complex
    var: float
    std: float
    se: float
    n_eff: float

    def __str__(self):
        m = self.mean
        ms = f"{m.real:.8f}" if abs(m.imag) < 1e-10 else f"{m:.8f}"
        return f"{ms} ± {self.se:.2e} [σ²={self.var:.3e}]"


def weighted_stats(values, weights, n_sample: float | None = None):
    """⟨O⟩, Var, σ, standard error under probability weights.

    ``weights`` sum to 1 (0 = dead row).  ``n_sample``: number of raw
    MC samples behind the weights (for the standard error); defaults
    to the effective sample size 1/Σw².
    """
    alive = weights > 0
    v = jnp.where(alive, values, 0.0)
    mean = (weights * v).sum()
    var = (weights * jnp.abs(v - mean) ** 2).sum()
    n_eff = 1.0 / jnp.maximum((weights**2).sum(), 1e-30)
    n = n_sample if n_sample is not None else n_eff
    se = jnp.sqrt(var / jnp.maximum(n, 1.0))
    return mean, var, se, n_eff


def operator_stats(values, weights, n_sample=None) -> OperatorStats:
    mean, var, se, n_eff = weighted_stats(values, weights, n_sample)
    return OperatorStats(
        mean=complex(mean),
        var=float(var),
        std=float(var) ** 0.5,
        se=float(se),
        n_eff=float(n_eff),
    )
