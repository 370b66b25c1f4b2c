"""HCI-style selected CI: variational selection + Epstein-Nesbet PT2.

The reference's CI ladder tops out at an SHCI runner that shells out to
the external DICE binary (reference utils/pyscf_helper/dice_pyscf.py:22,
interface_dice.py) and re-imports its (coeff, determinant) output.  The
binary is not shippable; this module is the in-repo equivalent — a
deterministic heat-bath-selected CI (Holmes, Tubman, Umrigar, JCTC 12,
3674 (2016)) built from parts the framework already has:

  * candidate generation + screening ride the SAME fused
    connected-space kernel as the local energy
    (:func:`pynqs_tpu.ops.hamiltonian.comb_hij` — the TPU analog of the
    reference's ``get_comb_hij_fused``, cpp_src/cuda/excitation.cu:130):
    one call yields every |H_ai| for a batch of parents, so the
    heat-bath criterion ``max_i |H_ai c_i| > eps1`` is a masked readout
    of work the chip does anyway;
  * the variational step is :func:`pynqs_tpu.ci.solve.solve_ci`
    (chunked Slater-Condon Davidson, device matvecs);
  * the optional second-order Epstein-Nesbet correction uses the same
    screened enumeration (term screen ``|H_ai c_i| > eps2``, the
    deterministic part of SHCI's semistochastic PT2).

Energies satisfy E_FCI <= E_var(eps1) with E_var -> E_FCI as eps1 -> 0,
and E_var + E_PT2 is the standard SHCI estimate.  Determinant sets and
coefficients round-trip through :func:`pynqs_tpu.ci.solve.save_ci`, so
a selected-CI state feeds the NQS pre-train / CI-NQS ladder exactly
like a CISD or external-DICE state.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pynqs_tpu.ci.solve import solve_ci
from pynqs_tpu.ci.wavefunction import CIWavefunction
from pynqs_tpu.ops import onv as onv_ops
from pynqs_tpu.ops.hamiltonian import comb_hij, hij_diagonal

__all__ = ["selected_ci", "en_pt2"]


def _void_keys(packed: np.ndarray) -> np.ndarray:
    """[N, nw] uint32 -> [N] opaque keys usable with np.isin/np.unique."""
    a = np.ascontiguousarray(packed)
    return a.view(np.dtype((np.void, a.dtype.itemsize * a.shape[1]))).ravel()


def _pack_np(bits: np.ndarray) -> np.ndarray:
    return np.asarray(onv_ops.pack_bits(jnp.asarray(bits, jnp.int8)))


def _screened_connected(bits, coeffs, ops, hpair, table, eps, chunk):
    """All (connected det, |H_ai c_i|, H_ai c_i) triples above the
    screen, concatenated over parent chunks.  Returns host arrays
    (bits [K, sorb] int8, importance [K] f64, signed term [K] f64).

    The ragged last chunk is padded to the fixed ``chunk`` shape (parent
    rows repeat, padded coefficients are zero so every padded term falls
    below the strict ``> eps`` screen) — one traced shape per call site
    instead of a retrace every selection round."""
    out_bits, out_imp, out_num = [], [], []
    n = bits.shape[0]
    for s in range(0, n, chunk):
        b_np = np.asarray(bits[s : s + chunk], np.int8)
        c_np = np.asarray(coeffs[s : s + chunk], np.float64)
        if b_np.shape[0] < chunk:  # pad: repeated parent, zero coeff
            pad = chunk - b_np.shape[0]
            b_np = np.concatenate([b_np, np.repeat(b_np[-1:], pad, 0)])
            c_np = np.concatenate([c_np, np.zeros(pad)])
        comb, hij = comb_hij(
            jnp.asarray(b_np), *ops, hpair, table=table, with_comb=True
        )
        hij = np.asarray(hij, np.float64)[:, 1:]  # drop the diagonal row
        comb = np.asarray(comb, np.int8)[:, 1:, :]
        term = hij * c_np[:, None]
        imp = np.abs(term)
        mask = imp > eps
        if mask.any():
            out_bits.append(comb[mask])
            out_imp.append(imp[mask])
            out_num.append(term[mask])
    if not out_bits:
        sorb = bits.shape[-1]
        z = np.zeros((0,), np.float64)
        return np.zeros((0, sorb), np.int8), z, z
    return (
        np.concatenate(out_bits),
        np.concatenate(out_imp),
        np.concatenate(out_num),
    )


def selected_ci(
    system,
    *,
    eps1: float = 1e-3,
    eps2: float | None = None,
    seed_bits: np.ndarray | None = None,
    max_rounds: int = 20,
    max_space: int = 1_000_000,
    chunk: int = 256,
    tol: float = 1e-9,
    cache_max: int = 8192,
    verbose: bool = False,
):
    """Heat-bath selected CI on ``system`` (any :class:`System`).

    Grows the variational space from ``seed_bits`` (default: the HF
    determinant) by adding every connected determinant with
    ``|H_ai c_i| > eps1`` for some parent i, re-diagonalizing each
    round, until the space stops growing (or ``max_rounds`` /
    ``max_space``).  When the space would exceed ``max_space`` the
    candidates with the largest importance are kept.

    Returns ``(e_var, ci, info)`` — variational energy (incl. ecore),
    the :class:`CIWavefunction`, and a dict with ``rounds``,
    ``space_sizes``, ``e_history`` and (when ``eps2`` is given)
    ``e_pt2``/``e_total`` from :func:`en_pt2`.
    """
    ops = tuple(jnp.asarray(np.asarray(x)) for x in system.tables.astuple())
    hpair = system.tables.hpair_best
    if isinstance(hpair, (tuple, list)):
        hpair = tuple(jnp.asarray(np.asarray(h)) for h in hpair)
    elif hpair is not None:
        hpair = jnp.asarray(np.asarray(hpair))
    table = system.excitation

    if seed_bits is None:
        seed_bits = np.asarray(
            onv_ops.hf_bits(system.sorb, system.noa, system.nob), np.int8
        )[None, :]
    space = np.asarray(seed_bits, np.int8)
    if space.ndim == 1:
        space = space[None, :]

    e_hist, sizes = [], [int(space.shape[0])]
    e_var, ci = solve_ci(
        space, system.tables, ecore=system.ecore, chunk=chunk,
        cache_max=cache_max, tol=tol,
    )
    e_hist.append(e_var)
    for rnd in range(max_rounds):
        cand, imp, _ = _screened_connected(
            space, np.asarray(ci.coeffs, np.float64), ops, hpair, table,
            eps1, chunk,
        )
        if cand.shape[0] == 0:
            break
        uq, first, inv = np.unique(
            _void_keys(_pack_np(cand)), return_index=True, return_inverse=True
        )
        # per-unique max importance (heat-bath ranking for the cap)
        imp_max = np.zeros(len(uq), np.float64)
        np.maximum.at(imp_max, inv, imp)
        new_mask = ~np.isin(uq, _void_keys(_pack_np(space)))
        cand_bits = cand[first][new_mask]
        cand_imp = imp_max[new_mask]
        if cand_bits.shape[0] == 0:
            break
        room = max_space - space.shape[0]
        if room <= 0:
            break
        if cand_bits.shape[0] > room:
            keep = np.argsort(-cand_imp)[:room]
            cand_bits = cand_bits[keep]
        space = np.concatenate([space, cand_bits])
        e_var, ci = solve_ci(
            space, system.tables, ecore=system.ecore, chunk=chunk,
            cache_max=cache_max, tol=tol,
        )
        e_hist.append(e_var)
        sizes.append(int(space.shape[0]))
        if verbose:
            print(
                f"selected_ci round {rnd}: m={space.shape[0]} "
                f"E={e_var:.8f}", flush=True,
            )

    info = {"rounds": len(sizes) - 1, "space_sizes": sizes,
            "e_history": e_hist}
    if eps2 is not None:
        de2 = en_pt2(
            system, ci, e_var, eps2=eps2, chunk=chunk, ops=ops,
            hpair=hpair, table=table,
        )
        info["e_pt2"] = de2
        info["e_total"] = e_var + de2
    return e_var, ci, info


def en_pt2(
    system,
    ci: CIWavefunction,
    e_var: float,
    *,
    eps2: float = 0.0,
    chunk: int = 256,
    ops=None,
    hpair=None,
    table=None,
    denom_floor: float = 1e-6,
) -> float:
    """Deterministic Epstein-Nesbet PT2 over the discarded space.

    ΔE2 = Σ_{a∉V} (Σ_i |H_ai c_i|>eps2) (Σ_i H_ai c_i)² / (E_var − H_aa),
    the deterministic part of SHCI's semistochastic correction
    (reference DICE output field ``E(PT2)``).  ``e_var`` must include
    ecore (denominators shift consistently).  Negative whenever the
    reference is good (E_var below every external diagonal); a poor
    reference (very loose eps1) can make individual denominators — and
    the total — positive, which is standard EN-PT2 behavior, not an
    error.  Intruder states (external determinants nearly degenerate
    with E_var) are guarded: |E_var − H_aa| is floored at
    ``denom_floor`` Ha with the sign preserved, as deterministic DICE
    PT2 does, so a single near-degenerate term cannot blow up the sum.
    """
    if ops is None:
        ops = tuple(jnp.asarray(np.asarray(x)) for x in system.tables.astuple())
    if table is None:
        table = system.excitation
    if hpair is None:
        hpair = system.tables.hpair_best
        if isinstance(hpair, (tuple, list)):
            hpair = tuple(jnp.asarray(np.asarray(h)) for h in hpair)
        elif hpair is not None:
            hpair = jnp.asarray(np.asarray(hpair))
    space = np.asarray(ci.bits, np.int8)
    cand, _, term = _screened_connected(
        space, np.asarray(ci.coeffs, np.float64), ops, hpair, table,
        eps2, chunk,
    )
    if cand.shape[0] == 0:
        return 0.0
    keys = _void_keys(_pack_np(cand))
    uq, first, inv = np.unique(keys, return_index=True, return_inverse=True)
    num = np.zeros(len(uq), np.float64)
    np.add.at(num, inv, term)
    external = ~np.isin(uq, _void_keys(_pack_np(space)))
    if not external.any():
        return 0.0
    a_bits = cand[first[external]]
    num = num[external]
    e_elec = e_var - system.ecore
    de2 = 0.0
    for s in range(0, a_bits.shape[0], 4096):
        haa = np.asarray(
            hij_diagonal(jnp.asarray(a_bits[s : s + 4096]), ops[2], ops[3]),
            np.float64,
        )
        denom = e_elec - haa
        denom = np.where(
            np.abs(denom) < denom_floor,
            np.where(denom < 0, -denom_floor, denom_floor),
            denom,
        )
        de2 += float(np.sum(num[s : s + 4096] ** 2 / denom))
    return de2
