"""Ansatz interface.

Every wavefunction model is a (hashable, static) configuration object
with pure functions over a real-leaved parameter pytree:

  * ``init(key) -> params``
  * ``log_psi(params, bits) -> pair``  for ``bits [..., sorb]`` int8
    occupation vectors; returns the REAL pair array ``[..., 2]`` of
    (log|ψ|, arg ψ) — see pynqs_tpu.ops.cplx.  (The TPU backend has no
    complex dtypes at all; amplitude-only models return phase 0.)

Autoregressive models additionally implement the exact-sampling
contract (reference vmc/ansatz/ansatz_base.py:11-37):

  * ``ar_init(params, capacity) -> carry`` and
    ``ar_step(params, carry, k, prev) -> (cond_logp [C, ncat], carry)``
    — consumed by the generic fixed-capacity driver
    (pynqs_tpu.sampler.ar.ar_sampling), whose ``counts == 0`` rows mark
    dead padding: XLA-friendly static buffers replace the reference's
    dynamically grown unique-sample tensors.

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

    def log_psi(self, params, bits: jax.Array) -> jax.Array:  # pair [..., 2]
        ...
