"""Electronic-structure system container.

TPU-native analog of the reference's ``ElectronInfo``
(utils/public_function.py:456-570) + integral readers
(utils/pyscf_helper/integral.py:20-114).  Holds electron counts,
compressed integrals, the core energy, and the device-side Slater–
Condon operand tables (see pynqs_tpu.ops.integrals).

Loaders:
  * :meth:`System.from_integrals` — dense h1e + compressed h2e arrays.
  * :meth:`System.from_pth`       — the reference's molecule ``.pth``
    files (h1e flattened [sorb^2], h2e compressed triangle, sorb, noa,
    nob, ecore, optional ci_space / e_lst) — bit-compatible storage.
  * :meth:`System.from_fcidump`   — standard FCIDUMP (restricted).
  * :meth:`System.hubbard_1d`     — 1D Hubbard model.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import cached_property

import numpy as np
import jax.numpy as jnp

from pynqs_tpu.ops import integrals as ints
from pynqs_tpu.ops.excitation import ExcitationTable, excitation_table

__all__ = ["System", "DeviceTables"]


@dataclass(frozen=True)
class DeviceTables:
    """Slater–Condon operands resident on device (see ops/integrals.py)."""

    h1e: jnp.ndarray
    h2e: jnp.ndarray
    diag1: jnp.ndarray
    K: jnp.ndarray
    J: jnp.ndarray
    hpair: jnp.ndarray | None = None  # dense pair matrix (MXU doubles)
    # spin-sector blocks (H_aa, H_bb, H_ab) — the preferred comb_hij
    # doubles operand (exact, ~5.8x fewer FLOPs than the dense matrix;
    # ops/integrals.hpair_sector_blocks)
    hpair_sect: tuple | None = None

    def astuple(self):
        return (self.h1e, self.h2e, self.diag1, self.K, self.J)

    @property
    def hpair_best(self):
        """Fastest available doubles operand for comb_hij."""
        return self.hpair_sect if self.hpair_sect is not None else self.hpair


@dataclass(frozen=True)
class System:
    sorb: int
    noa: int
    nob: int
    h1e: np.ndarray  # [sorb, sorb] dense
    h2e: np.ndarray  # compressed triangle
    ecore: float = 0.0
    e_ref: float | None = None  # FCI/DMRG reference energy (total)
    ci_space: np.ndarray | None = field(default=None, repr=False)
    dtype: np.dtype = np.float64

    @property
    def nele(self) -> int:
        return self.noa + self.nob

    @property
    def norb(self) -> int:
        return self.sorb // 2

    @cached_property
    def excitation(self) -> ExcitationTable:
        return excitation_table(self.sorb, self.noa, self.nob)

    @cached_property
    def tables(self) -> DeviceTables:
        t = ints.precompute_hij_tables(self.h1e, self.h2e, self.sorb, self.dtype)
        return DeviceTables(
            h1e=jnp.asarray(t.h1e),
            h2e=jnp.asarray(t.h2e),
            diag1=jnp.asarray(t.diag1),
            K=jnp.asarray(t.K),
            J=jnp.asarray(t.J),
            hpair=None if t.Hpair is None else jnp.asarray(t.Hpair),
            hpair_sect=None
            if t.Hpair_sect is None
            else tuple(jnp.asarray(b) for b in t.Hpair_sect),
        )

    def with_operator(
        self, h1e_p: np.ndarray, h2e_p: np.ndarray, coeff: float = 1.0
    ) -> "System":
        """System whose Hamiltonian is H + coeff * O, with O given as
        (dense h1e, compressed h2e) — e.g. ops.integrals.spin_raising.

        The Slater–Condon tables are linear in the integrals, so the
        penalized operator is just a summed-integral System (the
        reference instead threads use_spin_raising flags through the
        whole optimizer, vmc/optim/optimizer.py:245-297).  ``e_ref``
        is kept: for a spin-pure target state the penalty expectation
        vanishes at convergence.
        """
        import dataclasses

        h1e_p = np.asarray(h1e_p, dtype=np.float64)
        if h1e_p.ndim == 1:
            h1e_p = h1e_p.reshape(self.sorb, self.sorb)
        return dataclasses.replace(
            self,
            h1e=self.h1e + coeff * h1e_p,
            h2e=self.h2e + coeff * np.asarray(h2e_p, dtype=np.float64),
        )

    # ---------------- constructors ----------------

    @classmethod
    def from_integrals(
        cls,
        h1e: np.ndarray,
        h2e_compressed: np.ndarray,
        sorb: int,
        noa: int,
        nob: int,
        ecore: float = 0.0,
        **kw,
    ) -> "System":
        h1e = np.asarray(h1e, dtype=np.float64)
        if h1e.ndim == 1:
            h1e = h1e.reshape(sorb, sorb)
        return cls(
            sorb=sorb,
            noa=noa,
            nob=nob,
            h1e=h1e,
            h2e=np.asarray(h2e_compressed, dtype=np.float64),
            ecore=float(ecore),
            **kw,
        )

    @classmethod
    def from_spatial(
        cls,
        hcore: np.ndarray,
        eri_chemist: np.ndarray,
        noa: int,
        nob: int,
        ecore: float = 0.0,
        **kw,
    ) -> "System":
        """Spatial-orbital (hcore, chemist ERI) -> interleaved spin System."""
        h1e, h2e_c = ints.spin_orbital_from_spatial(hcore, eri_chemist)
        return cls.from_integrals(
            h1e, h2e_c, 2 * hcore.shape[0], noa, nob, ecore, **kw
        )

    @classmethod
    def from_pth(cls, path: str, **kw) -> "System":
        """Load a reference-format molecule .pth file (torch serialized).

        Format per reference utils/pyscf_helper/integral.py:20-114:
        keys h1e [sorb^2], h2e [triangle], sorb, noa, nob, ecore,
        optional ci_space (packed uint8 ONVs), e_lst.
        """
        import torch

        from pynqs_tpu.utils.torch_io import safe_torch_load

        d = safe_torch_load(path)
        e_ref = None
        if d.get("e_lst"):
            e_ref = float(np.asarray(d["e_lst"]).ravel()[0])
        ci_space = d.get("ci_space")
        if ci_space is not None:
            ci_space = np.asarray(ci_space.numpy())
        return cls.from_integrals(
            np.asarray(d["h1e"], dtype=np.float64),
            np.asarray(d["h2e"], dtype=np.float64),
            int(d["sorb"]),
            int(d["noa"]),
            int(d["nob"]),
            float(d.get("ecore", 0.0)),
            e_ref=e_ref,
            ci_space=ci_space,
            **kw,
        )

    @classmethod
    def from_fcidump(cls, path: str, **kw) -> "System":
        """Parse a (restricted) FCIDUMP into a System.

        Chemist notation (ij|kl) with 8-fold permutational symmetry;
        index 0 entries are hcore (i,j,0,0), ecore (0,0,0,0).
        """
        import re

        with open(path) as f:
            text = f.read()
        header, _, body = text.partition("&END")
        if not body:
            header, _, body = text.partition("/")
        m = re.search(r"NORB\s*=\s*(\d+)", header, re.I)
        norb = int(m.group(1))
        m = re.search(r"NELEC\s*=\s*(\d+)", header, re.I)
        nelec = int(m.group(1))
        m = re.search(r"MS2\s*=\s*(-?\d+)", header, re.I)
        ms2 = int(m.group(1)) if m else 0
        noa = (nelec + ms2) // 2
        nob = nelec - noa
        hcore = np.zeros((norb, norb))
        eri = np.zeros((norb,) * 4)
        ecore = 0.0
        for line in body.strip().splitlines():
            parts = line.split()
            if len(parts) != 5:
                continue
            v = float(parts[0])
            i, j, k, l = (int(x) for x in parts[1:])
            if i == 0:
                ecore = v
            elif k == 0:
                hcore[i - 1, j - 1] = hcore[j - 1, i - 1] = v
            else:
                i, j, k, l = i - 1, j - 1, k - 1, l - 1
                for a, b, c, d in (
                    (i, j, k, l), (j, i, k, l), (i, j, l, k), (j, i, l, k),
                    (k, l, i, j), (l, k, i, j), (k, l, j, i), (l, k, j, i),
                ):
                    eri[a, b, c, d] = v
        return cls.from_spatial(hcore, eri, noa, nob, ecore, **kw)

    @classmethod
    def hubbard_1d(
        cls,
        nsites: int,
        noa: int,
        nob: int,
        t: float = 1.0,
        u: float = 4.0,
        pbc: bool = False,
        **kw,
    ) -> "System":
        hcore, eri = ints.hubbard_1d(nsites, t, u, pbc)
        return cls.from_spatial(hcore, eri, noa, nob, 0.0, **kw)
