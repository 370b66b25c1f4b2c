"""Dense matrix-product-state wavefunction.

Re-design of the reference exact-MPS ansatz (vmc/ansatz/mps.py, which
wraps external FOCUS DMRG data and evaluates ψ with quantum-number
block lookups + MAGMA variable-batch GEMV chains `mps_vbatch`,
cpp_src/tensor/interface_magma.cpp).  TPU version: fixed-bond dense
complex site tensors (zero-padded from the QN-block structure — XLA
wants static shapes, and padded dense [B, D] @ [D, D] batched matvecs
on the MXU beat variable-shape chains), evaluated left-to-right with
per-site renormalization accumulating log-norms:

    ψ(x) = l† (Π_t A_t[x_t]) r,   log ψ carried as the (log|ψ|, arg)
    pair; the per-x selection A_t[x_t] is a 4-way one-hot einsum.

Usable as a learnable ansatz (MCMC/exact sampling — it is not
autoregressive) or as a frozen GFMC trial wavefunction.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from pynqs_tpu.ops import cplx

__all__ = ["MPSWavefunction"]


@dataclass(frozen=True)
class MPSWavefunction:
    sorb: int
    dcut: int = 16
    dtype: jnp.dtype = jnp.float64

    @property
    def norb(self):
        return self.sorb // 2

    def init(self, key: jax.Array):
        d = self.dcut
        k = jax.random.split(key, 3)
        eye = jnp.broadcast_to(jnp.eye(d, dtype=self.dtype), (self.norb, 4, d, d))
        noise = 0.05 / np.sqrt(d) * jax.random.normal(
            k[0], (self.norb, 4, d, d), self.dtype
        )
        return {
            "A_re": eye + noise,
            "A_im": 0.05 / np.sqrt(d)
            * jax.random.normal(k[1], (self.norb, 4, d, d), self.dtype),
            "l": jnp.ones((d,), self.dtype),
            "r": jnp.ones((d,), self.dtype),
        }

    def log_psi(self, params, bits: jax.Array) -> jax.Array:
        bits = bits.astype(jnp.int32)
        squeeze = bits.ndim == 1
        if squeeze:
            bits = bits[None]
        B = bits.shape[0]
        d = self.dcut
        vals = bits[:, 0::2] + 2 * bits[:, 1::2]  # [B, norb]

        v_re = jnp.broadcast_to(params["l"], (B, d))
        v_im = jnp.zeros((B, d), self.dtype)
        log_norm = jnp.zeros((B,), self.dtype)
        for t in range(self.norb):
            sel = jax.nn.one_hot(vals[:, t], 4, dtype=self.dtype)  # [B, 4]
            At_re = jnp.einsum("bx,xde->bde", sel, params["A_re"][t])
            At_im = jnp.einsum("bx,xde->bde", sel, params["A_im"][t])
            n_re = jnp.einsum("bd,bde->be", v_re, At_re) - jnp.einsum(
                "bd,bde->be", v_im, At_im
            )
            n_im = jnp.einsum("bd,bde->be", v_re, At_im) + jnp.einsum(
                "bd,bde->be", v_im, At_re
            )
            mag = jnp.sqrt(
                jnp.maximum((n_re**2 + n_im**2).sum(-1, keepdims=True), 1e-30)
            )
            log_norm = log_norm + jnp.log(mag[:, 0])
            v_re, v_im = n_re / mag, n_im / mag

        z_re = v_re @ params["r"]
        z_im = v_im @ params["r"]
        from pynqs_tpu.ops.cplx import safe_atan2

        la = log_norm + 0.5 * jnp.log(jnp.maximum(z_re**2 + z_im**2, 1e-30))
        ph = safe_atan2(z_im, z_re)
        out = cplx.make(la, ph)
        return out[0] if squeeze else out
