"""Pallas TPU kernel for the Slater–Condon doubles pair-selection.

The doubles values of `ops.hamiltonian.comb_hij` are
    W[b, u, v] = Hpair[po[b, u], pv[b, v]]
— a per-sample 2-D gather from the dense pair matrix.  The XLA path
realizes it as one-hot MXU matmuls, which is gather-free but
materializes the [B, n_u, npair] and [B, n_v, npair] one-hots in HBM
(~1.4 GB bf16 at Fe2S2 B=2048) and streams them through the MXU
(reference analog: the CUDA kernel gathers h2e directly per thread,
cpp_src/cuda/excitation.cu:130 — a scalar-core disaster on TPU).

Here the whole selection lives in VMEM and NOTHING data-dependent is
indexed (data-dependent gathers are scalar-core bound on TPU; see
CLAUDE.md):
  * Hpair is pre-split OUTSIDE the kernel into three bf16 terms
    (hi + lo + lo2 carries ≥24 mantissa bits — f32-faithful), each a
    grid-invariant VMEM block ([P, P] bf16, P = roundup(npair, 128),
    ~1.6 MB each at Fe2S2) — resident across the B-sample grid.
  * both one-hots are generated IN-REGISTER from iota compares
    (exact in bf16); per sample
        T_k = onehot(pv) @ H_k^T      [VP, P]  (row selection, exact;
                                       values are H_k entries, hence
                                       bf16-representable -> the
                                       downcast for the second dot is
                                       LOSSLESS)
        W  += onehot(po) @ T_k^T      [UP, VP] f32 accumulate
HBM traffic: po/pv indices in, W out — nothing else.  The extra MXU
work ([VP, P] @ [P, P] per sample) replaces ~GBs of one-hot HBM
streaming in the XLA path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pair_select_w"]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(pv_ref, po_ref, h1_ref, h2_ref, h3_ref, out_ref, *, P):
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    VP = pv_ref.shape[1]
    UP = po_ref.shape[1]

    pv = pv_ref[0]  # [VP, 1] int32
    po = po_ref[0]  # [UP, 1] int32
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (VP, P), 1)
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (UP, P), 1)
    oh_v = (pv == iota_v).astype(bf16)  # [VP, P]
    oh_u = (po == iota_u).astype(bf16)  # [UP, P]

    # T[v, q] = H_k[pv[v], q]: contract the one-hot against H's ROW
    # index (standard matmul), then W[u, v] = Σ_q oh_u·T — i.e. the
    # result is h[pv, po], which equals the advertised h[po, pv] for
    # the (always symmetric) physical pair matrix.  The round-3/4
    # "max err 6.77 on hardware" verdict was the check harness feeding
    # a NON-symmetric random h (root-caused round 5) — not a Mosaic
    # miscompile.  Promotion into comb_hij's "auto" is gated on the
    # on-chip re-validation + timing (scripts/tpu_pallas_hij_check.py).
    dn_row = (((1,), (0,)), ((), ()))  # A[v,p] B[p,q] -> [v,q]
    dn_lane = (((1,), (1,)), ((), ()))  # A[u,q] B[v,q] -> [u,v]
    w = jnp.zeros((UP, VP), f32)
    for h_ref in (h1_ref, h2_ref, h3_ref):
        t = jax.lax.dot_general(
            oh_v, h_ref[...], dn_row, preferred_element_type=f32
        )  # [VP, P]
        w += jax.lax.dot_general(
            oh_u, t.astype(bf16), dn_lane, preferred_element_type=f32
        )  # [UP, VP]; lossless downcast (T entries are H_k entries)
    out_ref[0] = w


def _kernel_rowrow(pv_ref, po_ref, h1_ref, h2_ref, h3_ref, out_ref, *, P):
    """Transposed-output variant (round-5 miscompile workaround
    attempt): BOTH dots are standard row-form contractions — the
    lane-lane dn of `_kernel`'s second dot, the prime remaining
    miscompile suspect, is avoided by building the po one-hot
    TRANSPOSED ([P, UP]: po rides the LANE axis of its block, the pair
    index on sublanes) so W^T = T [VP, P] @ oh_uT [P, UP] is a plain
    matmul; the [B, VP, UP] output is transposed back outside the
    kernel."""
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    VP = pv_ref.shape[1]
    UP = po_ref.shape[2]

    pv = pv_ref[0]  # [VP, 1] int32
    po_row = po_ref[0]  # [1, UP] int32 (lane layout)
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (VP, P), 1)
    iota_q = jax.lax.broadcasted_iota(jnp.int32, (P, UP), 0)
    oh_v = (pv == iota_v).astype(bf16)  # [VP, P]
    oh_uT = (po_row == iota_q).astype(bf16)  # [P, UP]

    dn_row = (((1,), (0,)), ((), ()))
    wt = jnp.zeros((VP, UP), f32)
    for h_ref in (h1_ref, h2_ref, h3_ref):
        t = jax.lax.dot_general(
            oh_v, h_ref[...], dn_row, preferred_element_type=f32
        )  # [VP, P]
        wt += jax.lax.dot_general(
            t.astype(bf16), oh_uT, dn_row, preferred_element_type=f32
        )  # [VP, UP]
    out_ref[0] = wt


@partial(jax.jit, static_argnames=("interpret", "variant"))
def pair_select_w(
    po: jax.Array,
    pv: jax.Array,
    hpair: jax.Array,
    *,
    interpret: bool = False,
    variant: str = "lane",
) -> jax.Array:
    """W[b, u, v] = hpair[po[b, u], pv[b, v]] for SYMMETRIC hpair.

    po [B, n_u] int32, pv [B, n_v] int32 (values < npair),
    hpair [npair, npair] f32 — MUST be symmetric: the two-dot
    contraction actually yields hpair[pv, po] (physical pair matrices
    are symmetric by construction, ops/integrals.py:328-330; an
    asymmetric test input is what produced the round-3/4 false
    "miscompile" verdict).  Returns [B, n_u, n_v] f32.
    ``variant``: "lane" = lane-lane second dot, "rowrow" =
    transposed-one-hot form (two standard matmuls, output transposed
    outside the kernel).
    """
    B, n_u = po.shape
    n_v = pv.shape[1]
    npair = hpair.shape[0]
    if variant == "rowrow":
        return _pair_select_w_rowrow(po, pv, hpair, interpret=interpret)
    P = _round_up(npair, 128)
    UP = _round_up(n_u, 8)
    VP = _round_up(n_v, 8)

    h = jnp.zeros((P, P), jnp.float32).at[:npair, :npair].set(
        hpair.astype(jnp.float32)
    )
    # 3-term bf16 split (hi + lo + lo2), computed once outside the grid
    h1 = h.astype(jnp.bfloat16)
    r1 = h - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)

    # pad slots point past the zero padding of h (selected rows/cols
    # are zero there, harmless).  Mosaic requires each block's last two
    # dims to be (8, 128)-divisible OR equal to the array's — both
    # index operands carry a leading batch axis so their trailing dims
    # match the block exactly.
    po_p = jnp.full((B, UP, 1), npair, jnp.int32).at[:, :n_u, 0].set(
        po.astype(jnp.int32)
    )
    pv_p = jnp.full((B, VP, 1), npair, jnp.int32).at[:, :n_v, 0].set(
        pv.astype(jnp.int32)
    )

    inv = lambda shape: pl.BlockSpec(  # noqa: E731 — grid-invariant
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        partial(_kernel, P=P),
        out_shape=jax.ShapeDtypeStruct((B, UP, VP), jnp.float32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, VP, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, UP, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            inv((P, P)),
            inv((P, P)),
            inv((P, P)),
        ],
        out_specs=pl.BlockSpec((1, UP, VP), lambda i: (i, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            # the grid-invariant H blocks double-buffer under the
            # default 16M scoped-vmem accounting
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(pv_p, po_p, h1, h2, h3)
    return out[:, :n_u, :n_v]


def _pair_select_w_rowrow(po, pv, hpair, *, interpret=False):
    B, n_u = po.shape
    n_v = pv.shape[1]
    npair = hpair.shape[0]
    P = _round_up(npair, 128)
    UP = _round_up(n_u, 128)  # po rides the LANE axis in this variant
    VP = _round_up(n_v, 8)

    h = jnp.zeros((P, P), jnp.float32).at[:npair, :npair].set(
        hpair.astype(jnp.float32)
    )
    h1 = h.astype(jnp.bfloat16)
    r1 = h - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)

    po_p = jnp.full((B, 1, UP), npair, jnp.int32).at[:, 0, :n_u].set(
        po.astype(jnp.int32)
    )
    pv_p = jnp.full((B, VP, 1), npair, jnp.int32).at[:, :n_v, 0].set(
        pv.astype(jnp.int32)
    )

    inv = lambda shape: pl.BlockSpec(  # noqa: E731 — grid-invariant
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        partial(_kernel_rowrow, P=P),
        out_shape=jax.ShapeDtypeStruct((B, VP, UP), jnp.float32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, VP, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, UP), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            inv((P, P)),
            inv((P, P)),
            inv((P, P)),
        ],
        out_specs=pl.BlockSpec((1, VP, UP), lambda i: (i, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(pv_p, po_p, h1, h2, h3)
    return jnp.swapaxes(out[:, :n_v, :n_u], 1, 2)
