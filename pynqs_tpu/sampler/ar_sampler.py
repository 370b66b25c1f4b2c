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
    # DFS prefix partitioning (reference use_dfs_sample/min_batch —
    # see ar.ar_sampling_dfs): >1 expands the tree exactly to
    # dfs_split_depth at dfs_capacity_root rows, then finishes
    # dfs_n_group disjoint prefix groups at full capacity each.
    # Effective capacity n_group × capacity with exact head expansion
    # (supersedes slabs for wide-tail states).
    dfs_n_group: int = 1
    dfs_split_depth: int | None = None
    dfs_capacity_root: int | None = None
    # post-sampling compaction: keep only the n highest-count rows so
    # the eloc/gradient phases scale with live rows, not buffer rows
    max_unique: int | None = None
    # adaptive n_sample: grow ×10 (re-sampling the whole tree inside a
    # lax.while_loop — one extra compile, n_sample is a traced scalar)
    # until at least ``target_unique`` distinct determinants emerge or
    # n_sample reaches ``max_n_sample`` (reference unique-count growth
    # loop, vmc/sample.py:571-625).  Counts stay exact up to n ≈ 2^24
    # (the f32 binomial cascade).
    target_unique: int | None = None
    max_n_sample: int | None = None
    # mesh mode: "same_tree" (default — devices split ONE branch tree,
    # disjoint by construction, no merge needed) or "independent" —
    # every device samples its OWN tree with a distinct key and
    # n_sample/n_dev draws, and duplicates are merged globally with
    # unique_onv (the reference's rank-independent sampling +
    # merge_rank_sample funnel, vmc/sample.py:627-772 + kernel.cu:520,
    # as one sorted segment-sum inside the jitted program — GSPMD
    # inserts the cross-device collectives).
    mesh_mode: str = "same_tree"
    # Rao-Blackwellized weights: replace the normalized multinomial
    # counts with the exact |ψ|² measure renormalized over the CAPTURED
    # unique set (rows with count > 0).  Since AR sampling is exact,
    # counts are just a noisy estimate of p(x) — with a near-exhaustive
    # capture (DFS dropped mass ≲0.05%) the exact weights remove the
    # count noise from the energy/gradient at a truncation bias of
    # order (dropped mass) × (E_dropped − E).  Applies to the exact-AR
    # modes only (the weights reuse the lp forward already computed).
    exact_weights: bool = False

    def init_state(self, key: jax.Array):
        # ARSampler is stateless; the "state" slot carries sampling
        # diagnostics out of the jitted step (structure must match
        # sample()'s return so the first iteration doesn't retrace).
        return {
            "dropped_frac": jnp.float32(0.0),
            "n_unique": jnp.float32(0.0),
        }

    def _sample_adaptive(self, model, params, key):
        import jax.numpy as jnp

        max_n = self.max_n_sample or 1000 * self.n_sample

        def draw(k, n):
            return ar_sampling(
                model, params, k, n, capacity=self.capacity
            )[:2]

        def cond(c):
            n, bits, counts, i = c
            return ((counts > 0).sum() < self.target_unique) & (
                n * 10 <= max_n
            )

        def body(c):
            n, bits, counts, i = c
            n = n * 10
            b2, c2 = draw(jax.random.fold_in(key, 1000 + i), n)
            return (n, b2, c2, i + 1)

        b0, c0 = draw(key, jnp.int32(self.n_sample))
        _, bits, counts, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(self.n_sample), b0, c0, 0)
        )
        return bits, counts

    def _sample_rank_independent(self, model, params, key):
        """Per-device independent trees + global duplicate merge."""
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P
        from jax.experimental.shard_map import shard_map

        from pynqs_tpu.ops import lut as _lut
        from pynqs_tpu.ops import onv as _onv

        n_dev = self.mesh.shape["dp"]
        n_local = self.n_sample // n_dev

        def local_fn(params):
            rank = jax.lax.axis_index("dp")
            k_l = jax.random.fold_in(key, 31 + rank)
            bits, counts, _ = ar_sampling(
                model, params, k_l, n_local, capacity=self.capacity
            )
            return bits, counts

        fn = shard_map(
            local_fn, mesh=self.mesh, in_specs=(P(),),
            out_specs=(P("dp"), P("dp")), check_rep=False,
        )
        bits, counts = fn(params)  # [n_dev*capacity, ...] sharded
        # global merge of duplicates across devices (sorted segment-sum;
        # the sort crosses shards via GSPMD collectives)
        uniq, counts, _n_u = _lut.unique_onv(_onv.pack_bits(bits), counts)
        bits = _onv.unpack_bits(uniq, model.sorb).astype(jnp.int8)
        return bits, counts

    def sample(self, model, params, key: jax.Array, state=None):
        n_sample = jnp.float32(self.n_sample)
        if self.target_unique is not None and self.mesh is None and self.n_slab == 1:
            bits, counts = self._sample_adaptive(model, params, key)
            # adaptive mode grows n_sample inside the loop; report the
            # drop against the realized total instead
            n_sample = jnp.maximum(counts.sum().astype(jnp.float32), 1.0)
        elif self.mesh is not None and self.mesh_mode == "independent":
            bits, counts = self._sample_rank_independent(model, params, key)
        elif self.mesh is not None:
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
        elif self.dfs_n_group > 1:
            from pynqs_tpu.sampler.ar import ar_sampling_dfs

            bits, counts, _dropped = ar_sampling_dfs(
                model, params, key, self.n_sample,
                capacity=self.capacity, n_group=self.dfs_n_group,
                split_depth=self.dfs_split_depth,
                capacity_root=self.dfs_capacity_root,
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
        if self.max_unique is not None and self.max_unique < bits.shape[0]:
            from pynqs_tpu.sampler.ar import compact_by_count

            bits, counts = compact_by_count(bits, counts, self.max_unique)
        # truncation diagnostic (the round-2/3 lesson: a truncated
        # sampling measure silently biases the energy — surface the
        # dropped mass every iteration, including compaction losses)
        dropped_frac = 1.0 - counts.sum().astype(jnp.float32) / n_sample
        n_unique = (counts > 0).sum().astype(jnp.float32)
        diag = {"dropped_frac": dropped_frac, "n_unique": n_unique}
        lp = model.log_psi(params, bits)  # [C, 2] pair
        if self.exact_weights:
            logw = jnp.where(
                counts > 0, 2.0 * lp[..., 0], -jnp.inf
            )
            logw = logw - jax.lax.stop_gradient(jnp.max(logw))
            p = jnp.exp(logw)
            w = jax.lax.stop_gradient(p / p.sum())
        else:
            w = counts.astype(lp.dtype) / jnp.maximum(counts.sum(), 1)
        return bits, w, lp, diag
