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


def energy_and_grad(model, params, bits, weights, eloc, *, grad_batch=None):
    """Returns (e_mean pair [2], grads pytree, variance real scalar).

    bits [B, sorb]; weights [B] real (sum 1; 0 = dead row);
    eloc [B, 2] (Re, Im) — both stop-gradient'd sampling results.

    ``grad_batch``: AD microbatch size (the reference's MAX_AD_DIM,
    vmc/grad/energy_grad.py:136-179): the surrogate's backward pass is
    accumulated over `lax.scan` chunks of this many rows so the saved
    forward activations scale with grad_batch, not B — required for
    ≥32k-row sample buffers at large dcut.  None = single AD pass.
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

    def chunk_surrogate(p, b, w, c, a):
        lp = model.log_psi(p, b)  # [gb, 2]
        lp = jnp.where(a[:, None], lp, 0.0)
        return 2.0 * (w * (c * lp).sum(-1)).sum()

    B = bits.shape[0]
    if grad_batch is None or grad_batch >= B:
        grads = jax.grad(chunk_surrogate)(params, bits, weights, cen, alive)
        return e_mean, grads, var

    # pad with dead rows (weight 0 → zero gradient contribution)
    pad = (-B) % grad_batch
    if pad:
        bits = jnp.concatenate(
            [bits, jnp.broadcast_to(bits[:1], (pad,) + bits.shape[1:])]
        )
        weights = jnp.concatenate([weights, jnp.zeros(pad, weights.dtype)])
        cen = jnp.concatenate([cen, jnp.zeros((pad, 2), cen.dtype)])
        alive = jnp.concatenate([alive, jnp.zeros(pad, bool)])
    g = bits.shape[0] // grad_batch
    chunks = (
        bits.reshape(g, grad_batch, -1),
        weights.reshape(g, grad_batch),
        cen.reshape(g, grad_batch, 2),
        alive.reshape(g, grad_batch),
    )

    def body(acc, xs):
        b, w, c, a = xs
        gch = jax.grad(chunk_surrogate)(params, b, w, c, a)
        return jax.tree.map(jnp.add, acc, gch), None

    zeros = jax.tree.map(jnp.zeros_like, params)
    grads, _ = jax.lax.scan(body, zeros, chunks)
    return e_mean, grads, var
