"""Metropolis MCMC sampler with spin-conserving exchange moves.

TPU re-design of the reference MCMC path (vmc/sample.py:446-504 +
C++ `spin_flip_rand`, cpp_src/tensor/cpu_tensor.cpp:112): many parallel
chains, each proposal exchanging one occupied and one virtual spin
orbital of the same spin channel (preserves (noa, nob)).  The whole
sweep is a `lax.scan` over steps with the chain batch evaluated in one
NN forward per step; all shapes static; counter-based `jax.random`
replaces the reference's seed juggling.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from pynqs_tpu.ops import onv
from pynqs_tpu.utils import fci as _fci  # noqa: F401  (HF init)

__all__ = ["MCMCSampler"]


@dataclass(frozen=True)
class MCMCSampler:
    sorb: int
    noa: int
    nob: int
    n_chain: int = 1024
    n_sweep: int = 32  # Metropolis steps between returned sample sets
    therm: int = 256  # extra steps on the first call
    # probability of composing a second exchange into the proposal
    # (double excitations — improves mixing when H couples mainly
    # through doubles; both single and composed moves are symmetric)
    p_double: float = 0.25

    def init_state(self, key: jax.Array) -> jax.Array:
        """Chains start at random (noa, nob) determinants: random
        permutations of the HF occupation within each spin channel."""
        norb = self.sorb // 2

        def chain_bits(k):
            ka, kb = jax.random.split(k)
            occ_a = jnp.zeros(norb, jnp.int8).at[: self.noa].set(1)
            occ_b = jnp.zeros(norb, jnp.int8).at[: self.nob].set(1)
            occ_a = jax.random.permutation(ka, occ_a)
            occ_b = jax.random.permutation(kb, occ_b)
            return jnp.stack([occ_a, occ_b], -1).reshape(-1)

        keys = jax.random.split(key, self.n_chain)
        return jax.vmap(chain_bits)(keys)

    def _propose(self, bits: jax.Array, key: jax.Array) -> jax.Array:
        """One spin-conserving occupied<->virtual exchange per chain."""
        nc = bits.shape[0]
        norb = self.sorb // 2
        nva, nvb = norb - self.noa, norb - self.nob
        kc, ko, kv = jax.random.split(key, 3)

        can_a = self.noa > 0 and nva > 0
        can_b = self.nob > 0 and nvb > 0
        if can_a and can_b:
            ch = jax.random.bernoulli(kc, 0.5, (nc,)).astype(jnp.int32)
        else:
            ch = jnp.full((nc,), 0 if can_a else 1, jnp.int32)

        no_c = jnp.where(ch == 0, self.noa, self.nob)
        nv_c = jnp.where(ch == 0, nva, nvb)
        io = (jax.random.uniform(ko, (nc,)) * no_c).astype(jnp.int32)
        iv = (jax.random.uniform(kv, (nc,)) * nv_c).astype(jnp.int32)

        merged = onv.merged_orbital_list(bits, self.noa, self.nob)  # [nc, sorb]
        occ_slot = 2 * io + ch
        vir_slot = 2 * (no_c + iv) + ch
        p_occ = jnp.take_along_axis(merged, occ_slot[:, None], axis=-1)[:, 0]
        p_vir = jnp.take_along_axis(merged, vir_slot[:, None], axis=-1)[:, 0]
        flip = jax.nn.one_hot(p_occ, self.sorb, dtype=jnp.int8) + jax.nn.one_hot(
            p_vir, self.sorb, dtype=jnp.int8
        )
        return jnp.bitwise_xor(bits, flip)

    def run(self, model, params, key: jax.Array, bits: jax.Array, n_steps: int):
        """n_steps Metropolis updates; returns (bits, log_psi)."""
        lp = model.log_psi(params, bits)

        def step(carry, k):
            b, lp = carry
            kp, kp2, kd, ka = jax.random.split(k, 4)
            nb = self._propose(b, kp)
            if self.p_double > 0:
                nb2 = self._propose(nb, kp2)
                dbl = jax.random.bernoulli(kd, self.p_double, (b.shape[0],))
                nb = jnp.where(dbl[:, None], nb2, nb)
            nlp = model.log_psi(params, nb)  # [nc, 2] pair
            # acceptance |psi_new/psi_old|^2, symmetric proposal
            log_ratio = 2 * (nlp[..., 0] - lp[..., 0])
            u = jax.random.uniform(ka, (b.shape[0],))
            acc = jnp.log(u) < log_ratio
            b = jnp.where(acc[:, None], nb, b)
            lp = jnp.where(acc[:, None], nlp, lp)
            return (b, lp), acc.mean()

        (bits, lp), acc = jax.lax.scan(
            step, (bits, lp), jax.random.split(key, n_steps)
        )
        return bits, lp, acc.mean()

    def sample(self, model, params, key: jax.Array, state: jax.Array):
        """Returns (bits, weights, log_psi, new_state).

        weights uniform 1/n_chain (plain MC measure).
        """
        bits, lp, _ = self.run(model, params, key, state, self.n_sweep)
        w = jnp.full((self.n_chain,), 1.0 / self.n_chain)
        return bits, w, lp, bits
