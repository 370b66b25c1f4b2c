"""Stochastic reconfiguration (natural gradient), pair representation.

With O_k = ∂(u + iv)/∂θ_k = g_u + i g_v (θ real, log ψ = (u, v) pair):

    Re S = ⟨g_u g_uᵀ + g_v g_vᵀ⟩ − ⟨g_u⟩⟨g_u⟩ᵀ − ⟨g_v⟩⟨g_v⟩ᵀ
    2 Re F = 2 ⟨ (a − ā) g_u + (b − b̄) g_v ⟩          (E_loc = a + ib)
    dθ = (Re S + λI)⁻¹ · 2 Re F

Reference: vmc/grad/sr.py + _jacobian.py (torch.func.vmap(grad)); in
JAX the per-sample Jacobians are `jax.vmap(jax.grad)` of the two real
outputs, and — unlike the reference, which raises under DDP
(vmc/optim/optimizer.py:174) — the weighted moment accumulations are
plain reductions that GSPMD shards across the device mesh for free.

Dense solve: O(P²) memory — same dense-inverse scope as the reference;
min-SR/kernel trick is future work for big models.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

__all__ = ["sr_gradient"]


def sr_gradient(
    model,
    params,
    bits: jax.Array,
    weights: jax.Array,
    eloc: jax.Array,
    damping: float = 1e-3,
    jac_batch: int | None = None,
):
    """Returns the SR-preconditioned gradient as a params-shaped pytree.

    eloc: [B, 2] pair; weights: [B] (0 = dead row).
    """
    theta0, unravel = ravel_pytree(params)
    weights = jax.lax.stop_gradient(weights)
    eloc = jax.lax.stop_gradient(eloc)
    alive = weights > 0
    eloc = jnp.where(alive[:, None], eloc, 0.0)
    e_mean = weights @ eloc
    cen = jnp.where(alive[:, None], eloc - e_mean, 0.0)  # [B, 2]

    def lp_flat(th, b):
        return model.log_psi(unravel(th), b[None, :])[0]  # [2]

    g_u = jax.grad(lambda th, b: lp_flat(th, b)[0])
    g_v = jax.grad(lambda th, b: lp_flat(th, b)[1])

    def row(b):
        return jnp.stack([g_u(theta0, b), g_v(theta0, b)])  # [2, P]

    if jac_batch is None:
        O = jax.vmap(row)(bits)  # [B, 2, P]
    else:
        nb = bits.shape[0]
        if nb % jac_batch:
            raise ValueError("jac_batch must divide the sample count")
        O = jax.lax.map(
            jax.vmap(row), bits.reshape(nb // jac_batch, jac_batch, -1)
        ).reshape(nb, 2, -1)
    O = jnp.where(alive[:, None, None], O, 0.0)

    o_mean = jnp.einsum("n,ncp->cp", weights, O)  # [2, P]
    Oc = jnp.where(alive[:, None, None], O - o_mean, 0.0)
    S = jnp.einsum("n,ncp,ncq->pq", weights, Oc, Oc)  # Re S
    F = 2.0 * jnp.einsum("n,nc,ncp->p", weights, cen, Oc)  # 2 Re F

    p = theta0.shape[0]
    A = S + damping * jnp.eye(p, dtype=S.dtype)
    dtheta = jax.scipy.linalg.solve(A, F, assume_a="pos")
    return unravel(dtheta)
