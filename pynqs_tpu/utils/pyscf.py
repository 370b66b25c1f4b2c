"""PySCF ingestion (host-side, import-gated).

Reference: utils/pyscf_helper/interface_pyscf.py (molecule → RHF →
integrals → spin-orbital file) + integral.py (reader).  PySCF is not a
hard dependency: everything here raises a clear error if it is absent,
and the rest of the framework only consumes `System` objects.
"""

from __future__ import annotations

import numpy as np

from pynqs_tpu.utils.system import System

__all__ = ["molecule_system", "has_pyscf"]


def has_pyscf() -> bool:
    try:
        import pyscf  # noqa: F401

        return True
    except ImportError:
        return False


def molecule_system(
    atom: str,
    basis: str = "sto-3g",
    charge: int = 0,
    spin: int = 0,
    frozen_core: int = 0,
    localize: str | None = None,  # e.g. "meta_lowdin"
    run_fci: bool = False,
) -> System:
    """Molecule → RHF (optionally localized orbitals) → spin System.

    Mirrors reference `interface`/`Iface.get_integral`
    (interface_pyscf.py:30-96) without the file round-trip: integrals
    go straight into a System.
    """
    if not has_pyscf():
        raise ImportError(
            "pyscf is not installed in this environment; load integrals "
            "from a .pth/FCIDUMP file instead (System.from_pth / "
            "System.from_fcidump)"
        )
    from pyscf import ao2mo, fci, gto, lo, scf

    mol = gto.M(atom=atom, basis=basis, charge=charge, spin=spin)
    mf = scf.RHF(mol).run()
    mo = mf.mo_coeff
    if localize is not None:
        mo = lo.orth_ao(mol, method=localize)
    norb = mo.shape[1] - frozen_core
    mo_act = mo[:, frozen_core:]
    hcore_ao = mf.get_hcore()
    ecore = float(mol.energy_nuc())
    if frozen_core:
        # fold frozen core with the in-repo (pyscf-free, tested)
        # transformation — utils/orbitals.freeze_core
        from pynqs_tpu.utils.orbitals import freeze_core

        h1_full = mo.T @ hcore_ao @ mo
        eri_full = ao2mo.restore(1, ao2mo.kernel(mol, mo), mo.shape[1])
        h1, eri, ecore = freeze_core(h1_full, eri_full, ecore, frozen_core)
    else:
        h1 = mo_act.T @ hcore_ao @ mo_act
        eri = ao2mo.restore(1, ao2mo.kernel(mol, mo_act), norb)
    nelec = mol.nelectron - 2 * frozen_core
    noa = (nelec + mol.spin) // 2
    nob = nelec - noa
    e_ref = None
    if run_fci:
        e_ref = float(
            fci.FCI(mf).kernel(h1, eri, norb, (noa, nob), ecore=ecore)[0]
        )
    return System.from_spatial(h1, eri, noa, nob, ecore, e_ref=e_ref)
