"""Pallas TPU kernel for the Slater–Condon doubles pair-selection.

The doubles values of `ops.hamiltonian.comb_hij` are
    W[b, u, v] = Hpair[po[b, u], pv[b, v]]
— a per-sample 2-D gather from the dense pair matrix.  The XLA path
realizes it as one-hot MXU matmuls, which is gather-free but
materializes the [B, n_u, npair] one-hot in HBM (~1.4 GB bf16 at
Fe2S2 B=2048) and streams it through the MXU (reference analog:
the CUDA kernel gathers h2e directly per thread,
cpp_src/cuda/excitation.cu:130 — a scalar-core disaster on TPU).

Here the whole selection lives in VMEM:
  * Hpair (padded [P, P] f32, P = roundup(npair, 128)) is a
    grid-invariant VMEM block (~3.2 MB at Fe2S2) — resident, exact.
  * T[v, :] = Hpair[pv[b, v], :] is assembled by n_v dynamic row
    slices (pv read from SMEM) — EXACT f32 rows, better than the XLA
    path's 3-split reconstruction of T.
  * The [n_u, P] one-hot of po is generated in-register from an iota
    compare and dotted against the three bf16 split terms of T
    (one-hot is exact in bf16; hi+lo+lo2 of the integral side carries
    ≥24 mantissa bits — the same f32-faithful scheme as the XLA path).
HBM traffic: po/pv indices in, W out — nothing else.
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


def _kernel(pv_ref, pot_ref, h_ref, out_ref, t_ref, *, n_v_pad, P):
    # ---- T rows: exact f32 dynamic row slices of Hpair ----
    def body(v, _):
        idx = pv_ref[0, v]
        row = h_ref[pl.ds(idx, 1), :]
        t_ref[pl.ds(v, 1), :] = row
        return 0

    jax.lax.fori_loop(0, n_v_pad, body, 0)

    T = t_ref[...]  # [n_v_pad, P] f32
    th = T.astype(jnp.bfloat16)
    r1 = T - th.astype(jnp.float32)
    tl = r1.astype(jnp.bfloat16)
    tq = (r1 - tl.astype(jnp.float32)).astype(jnp.bfloat16)

    # ---- one-hot of po, generated in-register ----
    po = pot_ref[...]  # [n_u_pad, 1] int32
    iota = jax.lax.broadcasted_iota(jnp.int32, (po.shape[0], P), 1)
    oh = (po == iota).astype(jnp.bfloat16)  # [n_u_pad, P]

    dn = (((1,), (1,)), ((), ()))
    w = jax.lax.dot_general(oh, th, dn, preferred_element_type=jnp.float32)
    w += jax.lax.dot_general(oh, tl, dn, preferred_element_type=jnp.float32)
    w += jax.lax.dot_general(oh, tq, dn, preferred_element_type=jnp.float32)
    out_ref[0] = w


@partial(jax.jit, static_argnames=("interpret",))
def pair_select_w(
    po: jax.Array,
    pv: jax.Array,
    hpair: jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
    """W[b, u, v] = hpair[po[b, u], pv[b, v]], f32-faithful.

    po [B, n_u] int32, pv [B, n_v] int32 (values < npair),
    hpair [npair, npair] f32.  Returns [B, n_u, n_v] f32.
    """
    B, n_u = po.shape
    n_v = pv.shape[1]
    npair = hpair.shape[0]
    P = _round_up(npair, 128)
    UP = _round_up(n_u, 8)
    VP = _round_up(n_v, 8)

    h_pad = jnp.zeros((P, P), jnp.float32).at[:npair, :npair].set(
        hpair.astype(jnp.float32)
    )
    # pad slots point at a zero-padded row/column of h_pad
    po_t = jnp.full((UP, B), npair, jnp.int32).at[:n_u].set(
        po.T.astype(jnp.int32)
    )
    pv_p = jnp.full((B, VP), npair, jnp.int32).at[:, :n_v].set(
        pv.astype(jnp.int32)
    )

    out = pl.pallas_call(
        partial(_kernel, n_v_pad=VP, P=P),
        out_shape=jax.ShapeDtypeStruct((B, UP, VP), jnp.float32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, VP), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((UP, 1), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, P), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, UP, VP), lambda i: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((VP, P), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            # the grid-invariant Hpair block double-buffers under the
            # default 16M scoped-vmem accounting
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(pv_p, po_t, h_pad)
    return out[:, :n_u, :n_v]
