"""MPS ansatz + DMRG warm-start import."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pynqs_tpu.models.mps import MPSWavefunction
from pynqs_tpu.ops import cplx
from pynqs_tpu.utils import fci


def test_mps_log_psi_vs_numpy_contraction():
    sorb, d = 8, 5
    model = MPSWavefunction(sorb, dcut=d)
    params = model.init(jax.random.PRNGKey(0))
    space = fci.fci_bits(sorb, 2, 2)
    lp = model.log_psi(params, jnp.asarray(space))
    psi = np.exp(cplx.to_np_complex(lp))

    A = np.asarray(params["A_re"]) + 1j * np.asarray(params["A_im"])
    l = np.asarray(params["l"]).astype(complex)
    r = np.asarray(params["r"]).astype(complex)
    for row, got in zip(space, psi):
        v = l.copy()
        for t in range(sorb // 2):
            x = int(row[2 * t] + 2 * row[2 * t + 1])
            v = v @ A[t, x]
        ref = v @ r
        np.testing.assert_allclose(got, ref, rtol=1e-9)


@pytest.mark.skipif(
    not __import__("os").path.exists(
        "/root/reference/example/Fe2S2/fe2s2-OO-dcut-20-focus-1e-8.pth"
    ),
    reason="reference Fe2S2 DMRG file not available",
)
def test_focus_import_samples_and_normalizes():
    from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN
    from pynqs_tpu.sampler.ar import ar_sampling
    from pynqs_tpu.utils import System
    from pynqs_tpu.utils.mps_import import load_focus_mpsrnn

    sys = System.from_pth("/root/reference/example/Fe2S2/fe2s2-OO.pth")
    model = GraphMPSRNN(
        sys.sorb, sys.noa, sys.nob, dcut=20,
        phase_mode="arg", norm_mode="mpsrnn",
    )
    params = load_focus_mpsrnn(
        "/root/reference/example/Fe2S2/fe2s2-OO-dcut-20-focus-1e-8.pth", model
    )
    bits, counts, dropped = ar_sampling(
        model, params, jax.random.PRNGKey(0), 50_000, capacity=256
    )
    counts = np.asarray(counts)
    assert counts.sum() > 0
    live = counts > 0
    b = np.asarray(bits)[live]
    assert (b[:, 0::2].sum(1) == sys.noa).all()
    assert (b[:, 1::2].sum(1) == sys.nob).all()
    lp = model.log_psi(params, jnp.asarray(b[:16]))
    assert bool(jnp.isfinite(lp).all())
    # the DMRG state is strongly peaked: dominant |psi|^2 > 0.3
    assert counts.max() / counts.sum() > 0.3


def test_structural_warm_start_preserves_wavefunction():
    """Chain checkpoint -> multi-predecessor + tensor-coupled model:
    with fresh_scale=0 the extra couplings are exactly zero, so the
    re-expressed model computes the SAME wavefunction; at the default
    near-zero fresh_scale it stays close."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN
    from pynqs_tpu.utils import fci
    from pynqs_tpu.utils.graph import dag_from_order
    from pynqs_tpu.utils.mps_import import structural_warm_start

    sorb, noa, nob = 8, 2, 2
    chain = GraphMPSRNN(sorb, noa, nob, dcut=6)
    p_chain = chain.init(jax.random.PRNGKey(1))
    # jitter so the checkpoint is not at init
    p_chain = jax.tree.map(
        lambda x: x + 0.1 * jnp.ones_like(x), p_chain
    )

    rng = np.random.default_rng(0)
    Kx = np.abs(rng.standard_normal((sorb // 2, sorb // 2)))
    Kx = (Kx + Kx.T) / 2
    graph = dag_from_order(list(range(sorb // 2)), Kx, max_preds=2)
    big = GraphMPSRNN(
        sorb, noa, nob, dcut=6, graph=graph, use_tensor=True
    )
    space = jnp.asarray(fci.fci_bits(sorb, noa, nob))
    lp_ref = np.asarray(chain.log_psi(p_chain, space))

    p0 = structural_warm_start(p_chain, big, fresh_scale=0.0)
    lp0 = np.asarray(big.log_psi(p0, space))
    np.testing.assert_allclose(lp0[:, 0], lp_ref[:, 0], atol=1e-10)
    # phases equal mod 2π
    dphi = (lp0[:, 1] - lp_ref[:, 1] + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(dphi, 0.0, atol=1e-5)

    p1 = structural_warm_start(p_chain, big, fresh_scale=1e-2)
    lp1 = np.asarray(big.log_psi(p1, space))
    assert np.abs(lp1[:, 0] - lp_ref[:, 0]).max() < 0.2


# ---------------------------------------------------------------------------
# Raw FOCUS CTNS loader (round-4): binary reader + conversion parity
# ---------------------------------------------------------------------------


def _write_ctns(path, sites, *, splits=None, zero_drop=None):
    """Synthetic FOCUS CTNS writer — the exact inverse of the
    reference's block-sparse reader (ctns_loader.py:17-46): sites are
    stored LAST-to-FIRST; per site the axes are split into quantum
    sectors; each block is stored (n, r, l) C-order at a 1-based
    offset; all-zero blocks get offset 0 and no data."""
    import struct

    rng = np.random.default_rng(11)
    buf = bytearray()
    buf += struct.pack("<i", len(sites))
    for si, t in enumerate(reversed(sites)):
        L, N, R = t.shape
        if splits is None:
            cut = lambda n: [n] if n < 3 else [n // 2, n - n // 2]
            sl, sn, sr = cut(L), cut(N), cut(R)
        else:
            sl, sn, sr = splits[len(sites) - 1 - si]

        def q(dims):
            return np.stack(
                [np.arange(len(dims)), np.zeros(len(dims), int), dims],
                axis=1,
            ).astype(np.int32)

        rows, cols, mids = len(sl), len(sr), len(sn)
        buf_site = struct.pack("<i", rows) + q(np.asarray(sl)).tobytes()
        buf_site += struct.pack("<i", cols) + q(np.asarray(sr)).tobytes()
        buf_site += struct.pack("<i", mids) + q(np.asarray(sn)).tobytes()
        ol = np.concatenate([[0], np.cumsum(sl)])
        orr = np.concatenate([[0], np.cumsum(sr)])
        on = np.concatenate([[0], np.cumsum(sn)])
        offsets = np.zeros((rows, cols, mids), np.uint64)
        data = []
        pos = 1  # offsets are 1-based; 0 marks an absent block
        for r in range(rows):
            for c in range(cols):
                for m in range(mids):
                    blk = t[
                        ol[r] : ol[r + 1], on[m] : on[m + 1],
                        orr[c] : orr[c + 1],
                    ]
                    if not blk.any():
                        continue  # exercise the offset-0 branch
                    offsets[r, c, m] = pos
                    flat = np.ascontiguousarray(
                        blk.transpose(1, 2, 0)
                    ).ravel()
                    data.append(flat)
                    pos += flat.size
        flat_all = (
            np.concatenate(data) if data else np.zeros(0, np.float64)
        )
        buf_site += offsets.tobytes()
        buf_site += struct.pack("<Q", flat_all.size) + flat_all.tobytes()
        buf += buf_site
    open(path, "wb").write(bytes(buf))


def _random_right_canonical_mps(rng, norb, dims):
    """Site tensors [l, 4, r] with sum_x A[x] A[x]^T = I (right
    canonical, like FOCUS rcanon files), some exact-zero blocks."""
    sites = []
    for t in range(norb):
        L, R = dims[t], dims[t + 1]
        a = rng.standard_normal((L, 4 * R))
        qq = np.linalg.qr(a.T, mode="reduced")[0].T  # [L, 4R] rows o.n.
        site = qq.reshape(L, 4, R)
        site[np.abs(site) < 0.05] = 0.0  # sparsity → zero blocks
        sites.append(site)
    return sites


def test_ctns_reader_roundtrip(tmp_path):
    """Binary → dense site tensors: byte-exact round trip through the
    block-sparse format, including zero blocks and multi-sector axes."""
    from pynqs_tpu.utils.focus_ctns import read_ctns_sites

    rng = np.random.default_rng(0)
    dims = [1, 3, 5, 4, 1]
    sites = _random_right_canonical_mps(rng, 4, dims)
    p = str(tmp_path / "rcanon.bin")
    _write_ctns(p, sites)
    got = read_ctns_sites(p)
    assert len(got) == len(sites)
    for a, b in zip(got, sites):
        np.testing.assert_array_equal(a, b)


def test_ctns_to_mpsrnn_matches_converted_path(tmp_path):
    """Raw-vs-converted import parity (round-3 VERDICT missing #2): the
    raw CTNS loader must produce byte-identical GraphMPSRNN params to
    the reference's two-step pipeline (Fmps2mpsrnn conversion ->
    load_focus_mpsrnn), transcribed independently here with torch."""
    import torch

    from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN
    from pynqs_tpu.utils.focus_ctns import load_focus_ctns_mpsrnn
    from pynqs_tpu.utils.mps_import import load_focus_mpsrnn

    rng = np.random.default_rng(1)
    norb, dcut = 5, 6
    dims = [1, 4, 6, 5, 3, 1]
    sites = _random_right_canonical_mps(rng, norb, dims)
    raw = str(tmp_path / "rcanon_isweep9.bin")
    _write_ctns(raw, sites)

    # --- reference conversion path (focus_helper.py:24-71) ---
    index = torch.tensor([0, 2, 3, 1])
    params2rnn = []
    for s in sites:
        m = torch.from_numpy(s)[:, index, :]
        m = torch.permute(m, (1, 2, 0)).contiguous().unsqueeze(-1)
        params2rnn.append(torch.cat([m, torch.zeros_like(m)], dim=-1))
    params2rnn = params2rnn[1:] + params2rnn[:1]
    B = max(max(m.shape[1], m.shape[2]) for m in params2rnn)
    param_w = torch.zeros((norb, B, 2), dtype=torch.float64)
    param_w[-1, :, 0] = 1.0
    param_c = torch.zeros((norb, 2), dtype=torch.float64)
    conv = str(tmp_path / "converted.pth")
    torch.save(
        {
            "model": {
                "module.params_M.all_sites": params2rnn,
                "module.params_w.all_sites": param_w,
                "module.params_c.all_sites": param_c,
            }
        },
        conv,
    )

    model = GraphMPSRNN(
        2 * norb, 2, 2, dcut=dcut, phase_mode="arg", norm_mode="mpsrnn",
        dtype=jnp.float64,
    )
    p_conv = load_focus_mpsrnn(conv, model)
    p_raw = load_focus_ctns_mpsrnn(raw, model)
    assert set(p_conv) == set(p_raw)
    for k in p_conv:
        np.testing.assert_array_equal(
            np.asarray(p_conv[k]), np.asarray(p_raw[k]), err_msg=k
        )


def test_ctns_import_matches_masked_conditional_oracle(tmp_path):
    """End-to-end physics of the raw import: the loaded GraphMPSRNN
    must equal an INDEPENDENT numpy walk of the masked-conditional
    MPS-RNN semantics on the same dense site tensors — h̃_t(x) =
    A_t[:, x, :]ᵀ h_{t-1}, P(x) ∝ ‖h̃(x)‖² masked+renormalized over the
    (N↑, N↓) sector, mpsrnn hidden normalization, phase = arg(Σ_d h_d)
    at the last site (w[-1] = 1 from the conversion).  This pins the
    boundary rotation, the FOCUS physical-index order (0,2,a,b) →
    (0,a,b,2), and the site reversal of the raw format."""
    from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN
    from pynqs_tpu.utils.focus_ctns import (
        load_focus_ctns_mpsrnn,
        read_ctns_sites,
    )
    from pynqs_tpu.utils import fci

    rng = np.random.default_rng(2)
    norb, noa, nob = 4, 2, 2
    dims = [1, 4, 6, 4, 1]
    sites = _random_right_canonical_mps(rng, norb, dims)
    p = str(tmp_path / "rcanon.bin")
    _write_ctns(p, sites)
    sites = read_ctns_sites(p)

    d = 6
    model = GraphMPSRNN(
        2 * norb, noa, nob, dcut=d, phase_mode="arg",
        norm_mode="mpsrnn", dtype=jnp.float64,
    )
    params = load_focus_ctns_mpsrnn(p, model)
    space = fci.fci_bits(2 * norb, noa, nob)
    lp = np.asarray(model.log_psi(params, jnp.asarray(space)))

    def pad(a, shape):
        out = np.zeros(shape)
        out[tuple(slice(0, s) for s in a.shape)] = a
        return out

    # dcut-padded transition tensors, model layout M[t][x] = A_t^T,
    # with FOCUS's physical basis order (0, 2, a, b) mapped to the
    # model's x = n_a + 2 n_b order (0, a, b, 2): x -> FOCUS index
    phys = [0, 2, 3, 1]
    A = [
        pad(np.transpose(s, (1, 2, 0)), (4, d, d))[phys] for s in sites
    ]
    for row, got in zip(space, lp):
        h = None
        log_amp = 0.0
        used_a = used_b = 0
        for t in range(norb):
            x = int(row[2 * t] + 2 * row[2 * t + 1])
            if t == 0:
                ht = A[0].sum(-1)  # [4, d]: boundary row-sum (Din = 1)
            else:
                ht = A[t] @ h  # [4, d]
            w = (ht**2).sum(-1)  # [4] (uniform eta cancels)
            rem = norb - t - 1
            occ_a = used_a + 1 <= noa
            emp_a = noa - used_a <= rem
            occ_b = used_b + 1 <= nob
            emp_b = nob - used_b <= rem
            m = np.array(
                [emp_a and emp_b, occ_a and emp_b,
                 emp_a and occ_b, occ_a and occ_b]
            )
            wm = np.where(m, w, 0.0)
            log_amp += 0.5 * np.log(wm[x] / wm.sum())
            h = ht[x] / np.sqrt((ht**2).mean())  # mpsrnn norm over (4, d)
            used_a += x & 1
            used_b += x >> 1
        phase = np.arctan2(0.0, h.sum())  # w[-1] = 1 (real), c = 0
        np.testing.assert_allclose(got[0], log_amp, atol=1e-10)
        dph = (got[1] - phase + np.pi) % (2 * np.pi) - np.pi
        assert abs(dph) < 1e-10, (got[1], phase)


def test_renormalizer_import_matches_converted_path(tmp_path):
    """load_renormalizer_mpsrnn (raw 1-site artifact of the reference's
    Rmps2mpsrnn, renormalizer_helper.py:74-78) must produce identical
    GraphMPSRNN params to the reference's own mps2mpsrnn conversion
    (:95-185), transcribed independently here with torch: contract
    spin-orbital pairs, remap [0,1,2,3]->[0,2,1,3], pack the converted
    structure, load through load_focus_mpsrnn."""
    import torch

    from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN
    from pynqs_tpu.utils.mps_import import (
        load_focus_mpsrnn,
        load_renormalizer_mpsrnn,
    )

    rng = np.random.default_rng(7)
    norb, dcut = 4, 5
    # 1-site right-canonical-ish tensors [l, 2, r] over 2*norb spin orbs
    dims = [1, 2, 4, 5, 5, 4, 3, 2, 1]
    ts = []
    for t in range(2 * norb):
        L, R = dims[t], dims[t + 1]
        a = rng.standard_normal((L, 2 * R))
        q = np.linalg.qr(a.T, mode="reduced")[0].T
        ts.append(np.ascontiguousarray(q.reshape(L, 2, R)))
    raw = str(tmp_path / "params2rnn_1site.pth")
    torch.save([torch.from_numpy(t) for t in ts], raw)

    # --- reference conversion (renormalizer_helper.py mps2mpsrnn) ---
    two = []
    for i in range(0, len(ts), 2):
        M1 = torch.from_numpy(ts[i])
        M2 = torch.from_numpy(ts[i + 1])
        _M = torch.einsum("iak,kbj->iabj", M1, M2).reshape(
            M1.shape[0], -1, M2.shape[-1]
        )
        two.append(torch.index_select(_M, 1, torch.tensor([0, 2, 1, 3])))
    params2rnn = []
    for M in two:
        m = torch.einsum("ijk->jki", M).unsqueeze(-1)
        params2rnn.append(torch.cat([m, torch.zeros_like(m)], dim=-1))
    params2rnn = params2rnn[1:] + params2rnn[:1]
    B = max(max(m.shape[1], m.shape[2]) for m in params2rnn)
    param_w = torch.zeros((norb, B, 2), dtype=torch.float64)
    param_w[-1, :, 0] = 1.0
    param_c = torch.zeros((norb, 2), dtype=torch.float64)
    conv = str(tmp_path / "converted.pth")
    torch.save(
        {
            "model": {
                "module.params_M.all_sites": params2rnn,
                "module.params_w.all_sites": param_w,
                "module.params_c.all_sites": param_c,
            }
        },
        conv,
    )

    model = GraphMPSRNN(
        2 * norb, 2, 2, dcut=dcut, phase_mode="arg", norm_mode="mpsrnn",
        dtype=jnp.float64,
    )
    p_conv = load_focus_mpsrnn(conv, model)
    p_raw = load_renormalizer_mpsrnn(raw, model)
    assert set(p_conv) == set(p_raw)
    for k in p_conv:
        np.testing.assert_allclose(
            np.asarray(p_conv[k]), np.asarray(p_raw[k]), rtol=1e-12,
            atol=1e-14, err_msg=k,
        )


def test_grow_dcut_exact_preserves_wavefunction():
    """dcut growth under the mpsrnn mean-gauge: zero-padding scales the
    post-gauge hidden by sqrt(d_new/d_old) at every site, so the naive
    pad changes the state; grow_dcut's 1/γ compensation of M/U/w_arg
    (round-5) makes the grow exactly wavefunction-preserving, and the
    phase-readout padding stays exactly zero so per-site z ≡ 0 gauge
    states don't pick up random atan2 angles."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN
    from pynqs_tpu.utils import fci
    from pynqs_tpu.utils.graph import dag_from_order
    from pynqs_tpu.utils.mps_import import grow_dcut

    sorb, noa, nob = 8, 2, 2
    rng = np.random.default_rng(0)
    Kx = np.abs(rng.standard_normal((sorb // 2, sorb // 2)))
    Kx = (Kx + Kx.T) / 2
    graph = dag_from_order(list(range(sorb // 2)), Kx, max_preds=2)

    def make(d):
        return GraphMPSRNN(sorb, noa, nob, dcut=d, graph=graph,
                           use_tensor=True, norm_mode="mpsrnn",
                           phase_mode="arg")

    small, big = make(5), make(9)
    p = small.init(jax.random.PRNGKey(2))
    p = jax.tree.map(lambda x: x + 0.07 * jnp.ones_like(x), p)
    # emulate a trained state with all phase on the terminal site
    # (the Fe2S2 flagship checkpoints hold z_t = 0 exactly for t < last)
    for k in ("w_arg_re", "w_arg_im", "c_arg_re", "c_arg_im"):
        v = np.asarray(p[k]).copy()
        v[:-1] = 0.0
        p[k] = jnp.asarray(v)
    space = jnp.asarray(fci.fci_bits(sorb, noa, nob))
    lp_ref = np.asarray(small.log_psi(p, space))

    p_g = grow_dcut({k: np.asarray(v) for k, v in p.items()}, small, big,
                    fresh_scale=0.0)
    lp_g = np.asarray(big.log_psi(p_g, space))
    np.testing.assert_allclose(lp_g[:, 0], lp_ref[:, 0], atol=1e-5)
    dphi = (lp_g[:, 1] - lp_ref[:, 1] + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(dphi, 0.0, atol=1e-5)

    # with symmetry-breaking noise the state stays close INCLUDING the
    # phase (the regression: noise in the phase-readout pad scrambled
    # arg by O(π) per determinant, independent of the noise scale)
    p_n = grow_dcut({k: np.asarray(v) for k, v in p.items()}, small, big,
                    fresh_scale=1e-3)
    lp_n = np.asarray(big.log_psi(p_n, space))
    assert np.abs(lp_n[:, 0] - lp_ref[:, 0]).max() < 1e-2
    dphi = (lp_n[:, 1] - lp_ref[:, 1] + np.pi) % (2 * np.pi) - np.pi
    assert np.abs(dphi).max() < 1e-2

    # naive (uncompensated) pad demonstrably changes the state
    p_naive = grow_dcut({k: np.asarray(v) for k, v in p.items()}, small,
                        big, exact=False, fresh_scale=0.0)
    lp_naive = np.asarray(big.log_psi(p_naive, space))
    assert np.abs(lp_naive[:, 0] - lp_ref[:, 0]).max() > 1e-3
