"""Native CI solver (ci/solve.py): Davidson vs dense-eigh oracle, the
CISD variational hierarchy, and the determinant-file roundtrip — the
in-repo replacement for the reference's pyscf CISD import
(utils/ci/interface_pyscf.py:13-144)."""

import numpy as np
import jax.numpy as jnp

import oracle
from pynqs_tpu.ci import cisd_space, load_ci, save_ci, solve_ci
from pynqs_tpu.ops.integrals import decompress_h2e
from pynqs_tpu.utils import System, fci


def test_solve_ci_full_space_matches_dense_oracle():
    sys = System.hubbard_1d(6, 2, 2, u=4.0)
    space = fci.fci_bits(sys.sorb, sys.noa, sys.nob)
    dets = oracle.fci_space(sys.sorb, sys.noa, sys.nob)
    H = oracle.dense_h(dets, sys.h1e, decompress_h2e(sys.h2e, sys.sorb))
    e_exact = np.linalg.eigvalsh(H)[0]
    e, ci = solve_ci(space, sys.tables, ecore=sys.ecore)
    assert abs(e - (e_exact + sys.ecore)) < 1e-6, (e, e_exact)
    # eigenvector check: largest coefficients agree up to global sign
    ec = ci.energy(sys.tables, ecore=sys.ecore)
    assert abs(ec - e) < 1e-6


def test_solve_ci_chunked_matvec_path():
    """cache_max=0 forces the recompute-per-matvec branch."""
    sys = System.hubbard_1d(4, 2, 2, u=2.0)
    space = fci.fci_bits(sys.sorb, sys.noa, sys.nob)
    e_cache, _ = solve_ci(space, sys.tables)
    e_chunk, _ = solve_ci(space, sys.tables, cache_max=0, chunk=7)
    assert abs(e_cache - e_chunk) < 1e-8


def test_cisd_between_hf_and_fci():
    sys = System.hubbard_1d(6, 3, 3, u=6.0)
    space_sd = cisd_space(sys.sorb, sys.noa, sys.nob)
    # CISD determinant count: 1 + n_singles + n_doubles
    from pynqs_tpu.ops.excitation import num_singles_doubles

    ns, nd, nsd = num_singles_doubles(sys.sorb, sys.noa, sys.nob)
    assert space_sd.shape[0] == 1 + nsd
    assert len(np.unique(space_sd, axis=0)) == space_sd.shape[0]

    from pynqs_tpu.ops.hamiltonian import hij_dense

    hf = space_sd[:1]
    ops = sys.tables.astuple()
    e_hf = float(hij_dense(jnp.asarray(hf), jnp.asarray(hf), *ops)[0, 0])
    e_sd, ci_sd = solve_ci(space_sd, sys.tables)
    space_full = fci.fci_bits(sys.sorb, sys.noa, sys.nob)
    e_fci, _ = solve_ci(space_full, sys.tables)
    assert e_sd < e_hf - 1e-6
    assert e_fci < e_sd - 1e-8  # CISD misses triples+quadruples at U=6


def test_ci_file_roundtrip(tmp_path):
    sys = System.hubbard_1d(4, 2, 2, u=4.0)
    space = cisd_space(sys.sorb, sys.noa, sys.nob)
    e, ci = solve_ci(space, sys.tables)
    p = str(tmp_path / "ci.npz")
    save_ci(p, ci, energy=e, sorb=sys.sorb, nele=sys.noa + sys.nob)
    ci2, meta = load_ci(p)
    np.testing.assert_allclose(ci2.coeffs, ci.coeffs, atol=1e-12)
    assert (ci2.bits == ci.bits).all()
    assert abs(float(meta["energy"]) - e) < 1e-12
    assert int(meta["sorb"]) == sys.sorb


def test_cisd_seeds_citrain_ladder():
    """The reference ladder's first rung: pre-train an ansatz onto the
    native CISD state (no pyscf anywhere)."""
    import jax
    import optax

    from pynqs_tpu.ci import CITrain, CITrainConfig
    from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN

    sys = System.hubbard_1d(4, 2, 2, u=4.0)
    _, ci = solve_ci(cisd_space(sys.sorb, sys.noa, sys.nob), sys.tables)
    ci = ci.select(1e-8)
    model = GraphMPSRNN(sys.sorb, sys.noa, sys.nob, dcut=8)
    tr = CITrain(
        model, ci, CITrainConfig(n_iter=150, lr=2e-2, loss="overlap")
    )
    params, hist = tr.run(jax.random.PRNGKey(0))
    ov = tr.overlap(params)
    assert ov > 0.9, ov


def test_freeze_core_matches_restricted_fci():
    """freeze_core oracle: FCI restricted to core-doubly-occupied
    determinants of the FULL system == FCI of the frozen-core-reduced
    system (pure integral identity, no pyscf)."""
    from pynqs_tpu.utils.orbitals import freeze_core

    rng = np.random.default_rng(7)
    n = 4  # spatial orbitals, freeze 1
    h1 = rng.standard_normal((n, n))
    h1 = (h1 + h1.T) / 2 - 2.0 * np.eye(n)  # core well below
    A = rng.standard_normal((n * n, n * n)) * 0.1
    eri = (A @ A.T).reshape(n, n, n, n)  # PSD 2e tensor, (pq|rs) sym
    eri = (eri + eri.transpose(1, 0, 2, 3)) / 2
    eri = (eri + eri.transpose(0, 1, 3, 2)) / 2
    eri = (eri + eri.transpose(2, 3, 0, 1)) / 2
    ecore = 0.37

    noa = nob = 2  # 4 electrons; orbital 0 frozen => 2 active electrons
    sys_full = System.from_spatial(h1, eri, noa, nob, ecore)
    space = fci.fci_bits(sys_full.sorb, noa, nob)
    core_occ = (space[:, 0] == 1) & (space[:, 1] == 1)
    e_restricted, _ = solve_ci(space[core_occ], sys_full.tables, ecore=ecore)

    h1a, eria, ecore_a = freeze_core(h1, eri, ecore, 1)
    sys_act = System.from_spatial(h1a, eria, noa - 1, nob - 1, ecore_a)
    space_a = fci.fci_bits(sys_act.sorb, noa - 1, nob - 1)
    e_frozen, _ = solve_ci(space_a, sys_act.tables, ecore=ecore_a)
    assert abs(e_restricted - e_frozen) < 1e-7, (e_restricted, e_frozen)
