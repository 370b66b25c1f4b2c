"""Raw FOCUS CTNS binary → Graph-MPS-RNN warm start.

The reference converts FOCUS DMRG output in two steps: a block-sparse
binary reader (utils/mps_helper/focus_utils/ctns_loader.py:1-116) and
an MPS→MPS-RNN re-layout saved as a torch state dict
(utils/mps_helper/focus_helper.py:11-73).  Round 1-3 only consumed the
PRE-CONVERTED state dicts (``utils/mps_import.load_focus_mpsrnn``);
this module reads the raw ``rcanon_isweep*.bin`` files directly, so new
molecules never need the reference's torch conversion script.

File layout (little-endian, validated against the reference reader):

  int32 ntotal                      # number of site tensors
  repeat ntotal times (sites stored LAST-to-FIRST — right canonical):
    int32  rows;  int32 qrow[rows, 3]    # (N, Sz?, deg) row sectors
    int32  cols;  int32 qcol[cols, 3]
    int32  mids;  int32 qmid[mids, 3]    # physical (4-dim) sectors
    uint64 offset[rows*cols*mids]        # 1-based into data; 0 = zero
                                         # block; C-order (r, c, m)
    uint64 size;  float64 data[size]     # blocks stored (m, c, r)
                                         # C-order at each offset

Dense per-site tensors come out in the reference's ``lnr`` convention
(left bond, physical n, right bond); ``toMPSdense`` then reverses the
site list back to first-to-last order.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "read_ctns_sites",
    "ctns_state_dict",
    "load_focus_ctns_mpsrnn",
]


def _read_tensor3(buf: memoryview, off: int, dtype) -> tuple[np.ndarray, int]:
    """One block-sparse site tensor → dense [l, n, r] (lnr), new offset."""

    def _i32(o):
        return struct.unpack_from("<i", buf, o)[0], o + 4

    def _arr(o, dt, count):
        a = np.frombuffer(buf, dtype=dt, count=count, offset=o)
        return a, o + a.nbytes

    rows, off = _i32(off)
    qrow, off = _arr(off, np.int32, 3 * rows)
    qrow = qrow.reshape(rows, 3)
    cols, off = _i32(off)
    qcol, off = _arr(off, np.int32, 3 * cols)
    qcol = qcol.reshape(cols, 3)
    mids, off = _i32(off)
    qmid, off = _arr(off, np.int32, 3 * mids)
    qmid = qmid.reshape(mids, 3)
    offset, off = _arr(off, np.uint64, rows * cols * mids)
    offset = offset.reshape(rows, cols, mids)
    size = struct.unpack_from("<Q", buf, off)[0]
    off += 8
    data, off = _arr(off, dtype, size)

    drow = qrow[:, 2]
    dcol = qcol[:, 2]
    dmid = qmid[:, 2]
    # dense assembly in (mid, col, row) then transpose to (row, mid, col)
    dt = np.zeros((dmid.sum(), dcol.sum(), drow.sum()), dtype=data.dtype)
    orow = np.concatenate([[0], np.cumsum(drow)])
    ocol = np.concatenate([[0], np.cumsum(dcol)])
    omid = np.concatenate([[0], np.cumsum(dmid)])
    for r in range(rows):
        for c in range(cols):
            for m in range(mids):
                o = int(offset[r, c, m])
                if o == 0:
                    continue
                dr, dc, dm = int(drow[r]), int(dcol[c]), int(dmid[m])
                blk = data[o - 1 : o - 1 + dr * dc * dm].reshape(dm, dc, dr)
                dt[
                    omid[m] : omid[m] + dm,
                    ocol[c] : ocol[c] + dc,
                    orow[r] : orow[r] + dr,
                ] = blk
    return dt.transpose(2, 0, 1).copy(), off


def read_ctns_sites(path: str, dtype=np.float64) -> list[np.ndarray]:
    """Dense MPS site tensors [l, n, r] in FIRST-to-last site order
    (the reference's ``ctns_info.toMPSdense``)."""
    raw = memoryview(open(path, "rb").read())
    ntotal = struct.unpack_from("<i", raw, 0)[0]
    off = 4
    sites: list[np.ndarray] = []
    for _ in range(ntotal):
        t, off = _read_tensor3(raw, off, dtype)
        sites.append(t)
    sites.reverse()  # stored right-canonical, last site first
    return sites


# FOCUS physical-index order is (0, 2, a, b); the MPS-RNN convention is
# (0, a, b, 2) — i.e. x = n_alpha + 2 n_beta.  new[k] = old[_PHYS[k]].
_PHYS = np.array([0, 2, 3, 1])


def ctns_state_dict(sites: list[np.ndarray], phys=None) -> dict:
    """Re-layout dense site tensors into the converted-file structure
    (the reference's Fmps2mpsrnn, focus_helper.py:24-71):

      params_M.all_sites: list of [4, Dout, Din, 2] (im = 0), rotated so
        site 0's tensor (the boundary M) is the LAST list entry;
      params_w.all_sites [norb, dcut, 2]: zero except w[-1] = 1;
      params_c.all_sites [norb, 2]: zeros.

    ``phys``: physical-index permutation applied per site (default the
    FOCUS order `_PHYS`; pass an identity for tensors already in the
    converted 4-basis order, e.g. the Renormalizer path).
    """
    if phys is None:
        phys = _PHYS
    M_list = []
    for t in sites:
        m = t[:, phys, :]  # (l, 4, r), physical re-indexed
        m = np.ascontiguousarray(np.transpose(m, (1, 2, 0)))  # [4, r=Dout, l=Din]
        M_list.append(np.stack([m, np.zeros_like(m)], axis=-1))
    M_list = M_list[1:] + M_list[:1]
    norb = len(sites)
    dcut = max(max(m.shape[1], m.shape[2]) for m in M_list)
    w = np.zeros((norb, dcut, 2))
    w[-1, :, 0] = 1.0
    c = np.zeros((norb, 2))
    return {
        "params_M.all_sites": M_list,
        "params_w.all_sites": w,
        "params_c.all_sites": c,
    }


def load_focus_ctns_mpsrnn(path: str, model, dtype=np.float64):
    """Warm-start GraphMPSRNN params straight from a raw FOCUS CTNS
    binary (e.g. ``rcanon_isweep49.bin``) — the raw-file equivalent of
    :func:`pynqs_tpu.utils.mps_import.load_focus_mpsrnn`."""
    from pynqs_tpu.utils.mps_import import mpsrnn_params_from_state_dict

    sites = read_ctns_sites(path, dtype)
    return mpsrnn_params_from_state_dict(ctns_state_dict(sites), model)
