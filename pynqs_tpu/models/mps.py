"""Dense matrix-product-state wavefunction.

Re-design of the reference exact-MPS ansatz (vmc/ansatz/mps.py, which
wraps external FOCUS DMRG data and evaluates ψ with quantum-number
block lookups + MAGMA variable-batch GEMV chains `mps_vbatch`,
cpp_src/tensor/interface_magma.cpp).  TPU version: fixed-bond dense
complex site tensors (zero-padded from the QN-block structure — XLA
wants static shapes, and padded dense [B, D] @ [D, D] batched matvecs
on the MXU beat variable-shape chains), evaluated left-to-right with
per-site renormalization accumulating log-norms:

    ψ(x) = l† (Π_t A_t[x_t]) r,   log ψ carried as the (log|ψ|, arg)
    pair; the per-x selection A_t[x_t] is a 4-way one-hot einsum.

Usable as a learnable ansatz (MCMC/exact sampling — it is not
autoregressive) or as a frozen GFMC trial wavefunction.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from pynqs_tpu.ops import cplx

__all__ = ["MPSWavefunction", "exact_mps_from_focus", "focus_trial_log_psi"]


@dataclass(frozen=True)
class MPSWavefunction:
    sorb: int
    dcut: int = 16
    dtype: jnp.dtype = jnp.float64

    @property
    def norb(self):
        return self.sorb // 2

    def init(self, key: jax.Array):
        d = self.dcut
        k = jax.random.split(key, 3)
        eye = jnp.broadcast_to(jnp.eye(d, dtype=self.dtype), (self.norb, 4, d, d))
        noise = 0.05 / np.sqrt(d) * jax.random.normal(
            k[0], (self.norb, 4, d, d), self.dtype
        )
        return {
            "A_re": eye + noise,
            "A_im": 0.05 / np.sqrt(d)
            * jax.random.normal(k[1], (self.norb, 4, d, d), self.dtype),
            "l": jnp.ones((d,), self.dtype),
            "r": jnp.ones((d,), self.dtype),
        }

    def log_psi(self, params, bits: jax.Array) -> jax.Array:
        bits = bits.astype(jnp.int32)
        squeeze = bits.ndim == 1
        if squeeze:
            bits = bits[None]
        B = bits.shape[0]
        d = self.dcut
        vals = bits[:, 0::2] + 2 * bits[:, 1::2]  # [B, norb]

        v_re = jnp.broadcast_to(params["l"], (B, d))
        v_im = jnp.zeros((B, d), self.dtype)
        log_norm = jnp.zeros((B,), self.dtype)
        for t in range(self.norb):
            sel = jax.nn.one_hot(vals[:, t], 4, dtype=self.dtype)  # [B, 4]
            At_re = jnp.einsum("bx,xde->bde", sel, params["A_re"][t])
            At_im = jnp.einsum("bx,xde->bde", sel, params["A_im"][t])
            n_re = jnp.einsum("bd,bde->be", v_re, At_re) - jnp.einsum(
                "bd,bde->be", v_im, At_im
            )
            n_im = jnp.einsum("bd,bde->be", v_re, At_im) + jnp.einsum(
                "bd,bde->be", v_im, At_re
            )
            mag = jnp.sqrt(
                jnp.maximum((n_re**2 + n_im**2).sum(-1, keepdims=True), 1e-30)
            )
            log_norm = log_norm + jnp.log(mag[:, 0])
            v_re, v_im = n_re / mag, n_im / mag

        z_re = v_re @ params["r"]
        z_im = v_im @ params["r"]
        from pynqs_tpu.ops.cplx import safe_atan2

        la = log_norm + 0.5 * jnp.log(jnp.maximum(z_re**2 + z_im**2, 1e-30))
        ph = safe_atan2(z_im, z_re)
        out = cplx.make(la, ph)
        return out[0] if squeeze else out


def exact_mps_from_focus(path: str, dtype=jnp.float64):
    """Load a converted FOCUS MPS file as a frozen RAW-chain evaluator.

    The reference evaluates FOCUS DMRG data with quantum-number block
    lookups + variable-batch GEMV chains (vmc/ansatz/mps.py:44-67,
    `convert_sites` cuda/kernel.cu:485, `mps_vbatch`
    interface_magma.cpp); the TPU version zero-pads every site's QN
    blocks into ONE dense complex tensor so the chain is static-shape
    MXU matvecs.  Returns (model: MPSWavefunction, params) evaluating

        ψ(x) = (Π_{t=norb-1..1} M_t[x_t]) · b[x_0],   b = boundary·1.

    CAVEAT (measured on the Fe2S2 file): the raw chain value is the
    physical amplitude only for CANONICAL site tensors.  The
    Fmps2mpsrnn conversion does NOT preserve canonical gauge — its
    per-prefix scales are absorbed by the MPS-RNN conditional
    normalization instead — so the raw product matches the validated
    import in PHASE exactly but not in amplitude.  For the DMRG state
    as a frozen GFMC trial use :func:`focus_trial_log_psi` (the
    conditional construction, energy-validated at +19 mHa on Fe2S2).
    """
    from pynqs_tpu.utils.torch_io import safe_torch_load

    sd = safe_torch_load(path)
    if "model" in sd:
        sd = sd["model"]
    sd = {k.replace("module.", "").replace("sample.", ""): v for k, v in sd.items()}
    M_list = sd["params_M.all_sites"]
    norb = len(M_list)
    d = max(
        max(np.asarray(m).shape[1] for m in M_list),
        max(np.asarray(m).shape[2] for m in M_list),
    )

    # model contract: v_out[e] = sum_d v_in[d] A[x, d, e]  (left matvec)
    # so A[x, in, out] = M_t[x, out, in] transposed
    A_re = np.zeros((norb, 4, d, d))
    A_im = np.zeros((norb, 4, d, d))
    Mb = np.asarray(M_list[-1])  # [4, Dout, Din, 2] first-site boundary
    bound = Mb.sum(axis=2)  # [4, Dout, 2]
    # site 0 "tensor": maps the trivial left boundary (index 0) -> bound[x]
    A_re[0, :, 0, : bound.shape[1]] = bound[..., 0]
    A_im[0, :, 0, : bound.shape[1]] = bound[..., 1]
    for t in range(1, norb):
        Mt = np.asarray(M_list[t - 1])  # [4, Dout, Din, 2]
        do, di = Mt.shape[1], Mt.shape[2]
        A_re[t, :, :di, :do] = np.swapaxes(Mt[..., 0], 1, 2)
        A_im[t, :, :di, :do] = np.swapaxes(Mt[..., 1], 1, 2)

    l = np.zeros(d)
    l[0] = 1.0  # trivial left boundary feeding site 0
    r = np.zeros(d)
    r[0] = 1.0  # final bond dimension is 1 (right boundary)
    model = MPSWavefunction(sorb=2 * norb, dcut=d, dtype=dtype)
    params = {
        "A_re": jnp.asarray(A_re, dtype),
        "A_im": jnp.asarray(A_im, dtype),
        "l": jnp.asarray(l, dtype),
        "r": jnp.asarray(r, dtype),
    }
    return model, params


def focus_trial_log_psi(path: str, noa: int, nob: int, dtype=jnp.float32):
    """Frozen DMRG trial wavefunction for GFMC (reference DMRG-as-trial,
    gfmc/walker.py + vmc/ansatz/mps.py): the FOCUS-converted MPS
    evaluated through the conditional (MPS-RNN gauge) construction —
    the representation whose energy reproduces the DMRG value.
    Returns a jittable ``bits [B, sorb] -> (log|ψ_T|, arg) [B, 2]``.
    """
    from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN
    from pynqs_tpu.utils.mps_import import load_focus_mpsrnn
    from pynqs_tpu.utils.torch_io import safe_torch_load

    sd = safe_torch_load(path)
    if "model" in sd:
        sd = sd["model"]
    n_sites = len(
        {k.replace("module.", "").replace("sample.", ""): v for k, v in sd.items()}[
            "params_M.all_sites"
        ]
    )
    dcut = max(
        np.asarray(m).shape[1]
        for m in {
            k.replace("module.", "").replace("sample.", ""): v
            for k, v in sd.items()
        }["params_M.all_sites"]
    )
    model = GraphMPSRNN(
        2 * n_sites, noa, nob, dcut=dcut,
        phase_mode="arg", norm_mode="mpsrnn", dtype=dtype,
    )
    params = load_focus_mpsrnn(path, model)

    def trial(bits):
        return model.log_psi(params, bits)

    return trial
