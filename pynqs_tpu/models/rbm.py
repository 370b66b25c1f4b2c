"""Restricted Boltzmann Machine wavefunctions (complex-free pair math).

Covers the reference's RBM family (vmc/ansatz/rbm/rbm.py:186-236):
real / complex parameters x {cosh, cos, tanh} hidden activations, i.e.

    log ψ(x) = a·x + Σ_j log( 2 f(W x + b)_j ),    x = ±1 spins,

with log ψ carried as the (log|ψ|, arg ψ) real pair demanded by the
TPU backend (see pynqs_tpu.ops.cplx): complex parameters are (re, im)
real-array pairs, θ = Wx + b is two real MXU matmuls, and the
log-activation magnitudes/phases come from stable closed forms
(|cosh(x+iy)|² = (cosh2x + cos2y)/2, etc.).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from pynqs_tpu.ops import cplx
from pynqs_tpu.ops.onv import bits_to_spins

__all__ = ["RBM"]

_ACT = {
    "cosh": cplx.log2cosh_pair,
    "cos": cplx.log2cos_pair,
    "tanh": cplx.log2tanh_pair,
}


@dataclass(frozen=True)
class RBM:
    """RBM ansatz. alpha = nh / sorb hidden-unit density."""

    sorb: int
    alpha: int = 2
    param_type: str = "complex"  # "real" | "complex"
    activation: str = "cosh"  # "cosh" | "cos" | "tanh"
    dtype: jnp.dtype = jnp.float64
    init_scale: float = 1e-2

    @property
    def nh(self) -> int:
        return self.alpha * self.sorb

    def init(self, key: jax.Array):
        k = jax.random.split(key, 6)
        s = self.init_scale

        def one(kk, shape):
            return s * jax.random.normal(kk, shape, dtype=self.dtype)

        p = {
            "a": one(k[0], (self.sorb,)),
            "W": one(k[1], (self.sorb, self.nh)),
            "b": one(k[2], (self.nh,)),
        }
        if self.param_type == "complex":
            p["a_im"] = one(k[3], (self.sorb,))
            p["W_im"] = one(k[4], (self.sorb, self.nh))
            p["b_im"] = one(k[5], (self.nh,))
        return p

    def log_psi(self, params, bits: jax.Array) -> jax.Array:
        x = bits_to_spins(bits, self.dtype)  # [..., sorb] ±1
        act = _ACT[self.activation]
        th_re = x @ params["W"] + params["b"]
        vis_re = x @ params["a"]
        if self.param_type == "complex":
            th_im = x @ params["W_im"] + params["b_im"]
            vis_im = x @ params["a_im"]
        else:
            th_im = jnp.zeros_like(th_re)
            vis_im = jnp.zeros_like(vis_re)
        la, ph = act(th_re, th_im)
        return cplx.make(vis_re + la.sum(-1), vis_im + ph.sum(-1))
