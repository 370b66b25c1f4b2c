"""DMRG-style freeze-and-sweep training masks.

Re-design of the reference FrozeSites (vmc/ansatz/rnn/mps_rnn.py:158-
230): instead of wrapping parameter tensors in modules that zero
sections of .grad, the sweep is a GRADIENT MASK pytree — 1.0 on the
active site window, 0.0 elsewhere — multiplied into the gradients
inside the jitted step (the mask is a dynamic input, so sweeping never
recompiles).  Works for any model whose site-indexed parameters carry
the site axis first (Graph-MPS-RNN, MPS-RNN, dense MPS).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["site_freeze_mask", "dmrg_sweep_schedule"]

# parameter names whose LEADING axis is the (spatial-site / visiting)
# index for the site-structured ansatze
_SITE_AXIS_PARAMS = {
    "M_re", "M_im", "v_re", "v_im", "eta", "U_re", "U_im", "K_re", "K_im",
    "w_arg_re", "w_arg_im", "c_arg_re", "c_arg_im", "w_ph", "c_ph",
    "A_re", "A_im",
}


def site_freeze_mask(params, active_sites, dtype=jnp.float32):
    """Gradient-mask pytree: 1 where trainable.

    Site-indexed parameters are masked per leading index (active sites
    only); everything else (global phase, phase MLPs, ...) stays fully
    trainable.
    """
    active = np.asarray(sorted(set(int(s) for s in active_sites)))

    def mask_one(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name in _SITE_AXIS_PARAMS and getattr(leaf, "ndim", 0) >= 1:
            m = np.zeros(leaf.shape[0], np.float32)
            m[active[active < leaf.shape[0]]] = 1.0
            shape = (leaf.shape[0],) + (1,) * (leaf.ndim - 1)
            return jnp.asarray(m.reshape(shape), dtype)
        return jnp.ones((), dtype)

    return jax.tree_util.tree_map_with_path(mask_one, params)


def dmrg_sweep_schedule(norb: int, window: int = 2, iters_per_window: int = 50):
    """Yields (start_iter, active_sites) sweeping
    left→right then right→left forever (reference Left(Froze) →
    Mid(Opt) → Right(Froze) and back)."""
    starts = list(range(0, max(norb - window + 1, 1)))
    order = starts + starts[::-1][1:-1] if len(starts) > 1 else starts
    it = 0
    while True:
        for s in order:
            yield it, list(range(s, min(s + window, norb)))
            it += iters_per_window
