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
    """With ``mesh`` set, sampling runs tree-sharded over the mesh's
    ``dp`` axis (reference "use_same_tree" multi-rank sampling): each
    device owns a disjoint slice of the branch tree, so the unique
    sample buffer comes back sharded with no cross-device merge."""

    sorb: int
    noa: int
    nob: int
    n_sample: int = 1 << 12
    capacity: int = 1 << 10  # max unique determinants carried per tree
    mesh: object = None
    tree_height: int | None = None
    # slab count: >1 expands n_sample over n_slab independent
    # capacity-C trees (exactly Multinomial-additive, see
    # ar.ar_sampling_slabbed) — the static-shape replacement for the
    # reference's DFS frontier chunking; effective capacity is
    # n_slab × capacity.
    n_slab: int = 1

    def init_state(self, key: jax.Array):
        return None

    def sample(self, model, params, key: jax.Array, state=None):
        if self.mesh is not None:
            from pynqs_tpu.sampler.ar import ar_sampling_sharded

            if self.n_slab > 1:
                slabs = []
                for s in range(self.n_slab):
                    b, c, _d = ar_sampling_sharded(
                        model, params, jax.random.fold_in(key, s),
                        self.n_sample // self.n_slab,
                        capacity=self.capacity, mesh=self.mesh,
                        tree_height=self.tree_height,
                    )
                    slabs.append((b, c))
                bits = jnp.concatenate([b for b, _ in slabs], axis=0)
                counts = jnp.concatenate([c for _, c in slabs], axis=0)
            else:
                bits, counts, _dropped = ar_sampling_sharded(
                    model, params, key, self.n_sample,
                    capacity=self.capacity, mesh=self.mesh,
                    tree_height=self.tree_height,
                )
        elif self.n_slab > 1:
            from pynqs_tpu.sampler.ar import ar_sampling_slabbed

            bits, counts, _dropped = ar_sampling_slabbed(
                model, params, key, self.n_sample,
                capacity=self.capacity, n_slab=self.n_slab,
            )
        else:
            bits, counts, _dropped = ar_sampling(
                model, params, key, self.n_sample, capacity=self.capacity
            )
        lp = model.log_psi(params, bits)  # [C, 2] pair
        w = counts.astype(lp.dtype) / jnp.maximum(counts.sum(), 1)
        return bits, w, lp, None
