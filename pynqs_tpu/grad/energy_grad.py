"""Variational energy gradient (pair representation, complex-free).

    ∂E = 2 Re ⟨ (E_loc − ⟨E⟩)* ∂ log ψ ⟩_w
       = 2 ⟨ (a − ā)·∂u + (b − b̄)·∂v ⟩_w

for E_loc = a + ib and log ψ = u + iv carried as real pairs [..., 2]
(the reference's AD surrogate-loss construction,
vmc/grad/energy_grad.py:118-184, minus DDP — psum over the mesh comes
from GSPMD).  Microbatching (MAX_AD_DIM) becomes `lax.map` chunks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["energy_and_grad"]


def energy_and_grad(model, params, bits, weights, eloc):
    """Returns (e_mean pair [2], grads pytree, variance real scalar).

    bits [B, sorb]; weights [B] real (sum 1; 0 = dead row);
    eloc [B, 2] (Re, Im) — both stop-gradient'd sampling results.
    """
    weights = jax.lax.stop_gradient(weights)
    eloc = jax.lax.stop_gradient(eloc)
    # dead padding rows (weight 0, e.g. AR capacity buffer) may hold
    # inf/NaN eloc — select them out before any arithmetic touches them
    alive = weights > 0
    eloc = jnp.where(alive[:, None], eloc, 0.0)
    e_mean = weights @ eloc  # [2]
    cen = jnp.where(alive[:, None], eloc - e_mean, 0.0)
    var = (weights * (cen**2).sum(-1)).sum()

    def surrogate(p):
        lp = model.log_psi(p, bits)  # [B, 2]
        lp = jnp.where(alive[:, None], lp, 0.0)
        return 2.0 * (weights * (cen * lp).sum(-1)).sum()

    grads = jax.grad(surrogate)(params)
    return e_mean, grads, var
