"""CI wavefunction container + deterministic energy.

Reference: utils/ci/wavefunction.py (CIWavefunction, chunked energy_CI).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from pynqs_tpu.ops.hamiltonian import hij_dense

__all__ = ["CIWavefunction"]


@dataclass(frozen=True)
class CIWavefunction:
    """coeffs [m] (normalized), bits [m, sorb] int8 determinants."""

    coeffs: np.ndarray
    bits: np.ndarray

    def __post_init__(self):
        c = np.asarray(self.coeffs)
        n = np.linalg.norm(c)
        if n > 0:
            object.__setattr__(self, "coeffs", c / n)

    @property
    def m(self) -> int:
        return self.bits.shape[0]

    def select(self, threshold: float) -> "CIWavefunction":
        """Keep determinants with |c| >= threshold (reference
        det_helper/select.py select_det), sorted by |c| descending."""
        c = np.abs(np.asarray(self.coeffs))
        keep = np.nonzero(c >= threshold)[0]
        order = keep[np.argsort(-c[keep])]
        return CIWavefunction(
            coeffs=np.asarray(self.coeffs)[order], bits=self.bits[order]
        )

    def energy(self, tables, ecore: float = 0.0, chunk: int = 512) -> float:
        """⟨ψ|H|ψ⟩ + ecore via chunked dense Slater–Condon blocks."""
        m = self.m
        c = jnp.asarray(self.coeffs)
        bits = jnp.asarray(self.bits)
        ops = tables.astuple() if hasattr(tables, "astuple") else tables
        e = 0.0
        for s in range(0, m, chunk):
            rows = bits[s : s + chunk]
            h_block = hij_dense(rows, bits, *ops)  # [chunk, m]
            e += float(jnp.real(c[s : s + chunk] @ (h_block @ c)))
        return e + ecore

    @classmethod
    def hf_rooted(cls, sorb: int, noa: int, nob: int) -> "CIWavefunction":
        from pynqs_tpu.ops import onv

        return cls(
            coeffs=np.ones(1), bits=onv.hf_bits(sorb, noa, nob)[None, :]
        )
