"""Ansatz interface.

Every wavefunction model is a (hashable, static) configuration object
with pure functions over a real-leaved parameter pytree:

  * ``init(key) -> params``
  * ``log_psi(params, bits) -> complex``  for ``bits [..., sorb]`` int8
    occupation vectors; returns ``log ψ`` with dtype complex (the
    imaginary part is the phase; amplitude-only models return 0 phase).

Autoregressive models additionally implement the exact-sampling
contract (reference vmc/ansatz/ansatz_base.py:11-37):

  * ``ar_sampling(params, key, n_sample, *, capacity) ->
        (unique_bits [capacity, sorb], counts [capacity],
         log_psi [capacity] complex)``
    with ``counts == 0`` marking dead padding rows — XLA-friendly
    fixed-capacity buffers replace the reference's dynamically grown
    unique-sample tensors.

All parameters are REAL arrays (complex quantities are carried as
(re, im) pairs inside the pytree) so any optax transform applies
unchanged and TPU kernels stay in real arithmetic.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

import jax


@runtime_checkable
class Ansatz(Protocol):
    sorb: int

    def init(self, key: jax.Array):  # -> params pytree
        ...

    def log_psi(self, params, bits: jax.Array) -> jax.Array:  # complex [...]
        ...
