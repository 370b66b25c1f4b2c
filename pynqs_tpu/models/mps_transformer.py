"""MPS-Transformer: transformer-modulated matrix-product amplitudes.

Re-design of the reference MPSdecoder (vmc/ansatz/transformer/
mps_transformer.py): a causal GPT backbone reads the sampled prefix
and emits, per 2-site block, a modulation of learned base MPS site
tensors; amplitudes come from the contracted matrix chain

    h̃_t(x) = v_{t-1} · [ A_t(x) ⊙ (1 + s_t(x)) ],   P(x) ∝ ‖h̃_t(x)‖²

(the reference's element-wise "pmode" — per-(x, column) scaling
s_t(x) = head(h^GPT_t), mps_transformer.py:27-80) with the complex
carry v renormalized per site; phase from arg(w_t · v_t + c_t).

Reuses the decoder building blocks (attention with preallocated KV
cache) from models/transformer.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from pynqs_tpu.models.transformer import (
    DecoderWavefunction,
    _dense,
    _dense_init,
)
from pynqs_tpu.ops import cplx
from pynqs_tpu.sampler.symmetry import apply_mask_logp, mask_two_site

__all__ = ["MPSDecoder"]


@dataclass(frozen=True)
class MPSDecoder:
    sorb: int
    noa: int
    nob: int
    dcut: int = 8
    n_layer: int = 1
    n_head: int = 2
    d_model: int = 32
    dtype: jnp.dtype = jnp.float64
    sites_per_step: int = 2
    # how the transformer hidden state modulates the base MPS site
    # tensors (reference pmode, mps_transformer.py:39 + get_Decoderwf
    # :360-397 — re-parametrized TPU-natively, same parameter-count
    # scaling per mode):
    #   "element": A ∘ (1 + s), per-(x, column) scale  (reference
    #              element-wise / default)
    #   "linear":  A + g[b,x] · Wt[α,β], NN scalar times a learned
    #              per-block bond matrix (reference pmode="linear")
    #   "conv":    A + u[b,x,α] ⊗ w[β], NN row vector times a learned
    #              column vector (separable, reference pmode="conv")
    #   "spm":     A·(1 + g[b,x]) + h[b,x], scalar-plus-shift
    #              (reference pmode="spm")
    pmode: str = "element"

    @property
    def n_blocks(self):
        return self.sorb // 2

    def _backbone(self):
        # configuration-only helper; shares init/forward machinery
        return DecoderWavefunction(
            self.sorb, self.noa, self.nob,
            n_layer=self.n_layer, n_head=self.n_head, d_model=self.d_model,
            dtype=self.dtype,
        )

    def init(self, key: jax.Array):
        kb, k1, k2, k3, k4 = jax.random.split(key, 5)
        bb = self._backbone().init(kb)
        nb, d = self.n_blocks, self.dcut
        eye = jnp.broadcast_to(jnp.eye(d, dtype=self.dtype), (nb, 4, d, d))
        p = {
            "bb": bb,
            "A_re": eye
            + 0.05 / np.sqrt(d)
            * jax.random.normal(k1, (nb, 4, d, d), self.dtype),
            "A_im": 0.05 / np.sqrt(d)
            * jax.random.normal(k2, (nb, 4, d, d), self.dtype),
            # modulation head: d_model -> [4, dcut] per block (shared)
            "mod": _dense_init(k3, self.d_model, 4 * d, self.dtype, scale=0.01),
            **(
                {"Wt": 0.05 / np.sqrt(d)
                 * jax.random.normal(k3, (nb, d, d), self.dtype),
                 "mod_g": _dense_init(k3, self.d_model, 4, self.dtype,
                                      scale=0.01)}
                if self.pmode == "linear" else {}
            ),
            **(
                {"wc": 0.1 * jax.random.normal(k3, (nb, d), self.dtype)}
                if self.pmode == "conv" else {}
            ),
            **(
                {"mod_g": _dense_init(k3, self.d_model, 8, self.dtype,
                                      scale=0.01)}
                if self.pmode == "spm" else {}
            ),
            "w_re": 1.0 / np.sqrt(d)
            * jax.random.normal(k4, (nb, d), self.dtype),
            "w_im": jnp.zeros((nb, d), self.dtype),
            "c_re": jnp.ones((nb,), self.dtype),
            "c_im": jnp.zeros((nb,), self.dtype),
        }
        return p

    # ---------------- shared site step ----------------

    def _site_weights(self, params, t, h_gpt, v_re, v_im):
        """Candidate carries + log-weights for block t.

        h_gpt [B, d_model]; v_* [B, dcut].
        Returns (cand_re, cand_im [B, 4, dcut], logw [B, 4]).
        """
        B = h_gpt.shape[0]
        d = self.dcut
        if self.pmode == "element":
            s = _dense(params["mod"], h_gpt).reshape(B, 4, 1, d)
            A_re = params["A_re"][t][None] * (1.0 + s)  # [B, 4, d, d]
            A_im = params["A_im"][t][None] * (1.0 + s)
        elif self.pmode == "linear":
            g = _dense(params["mod_g"], h_gpt).reshape(B, 4, 1, 1)
            Wt = params["Wt"][t][None, None]  # [1, 1, d, d]
            A_re = params["A_re"][t][None] + g * Wt
            A_im = params["A_im"][t][None] + g * Wt
        elif self.pmode == "conv":
            u = _dense(params["mod"], h_gpt).reshape(B, 4, d, 1)
            wc = params["wc"][t][None, None, None, :]  # [1, 1, 1, d]
            A_re = params["A_re"][t][None] + u * wc
            A_im = params["A_im"][t][None] + u * wc
        elif self.pmode == "spm":
            gh = _dense(params["mod_g"], h_gpt).reshape(B, 8)
            g = gh[:, :4].reshape(B, 4, 1, 1)
            hshift = gh[:, 4:].reshape(B, 4, 1, 1)
            A_re = params["A_re"][t][None] * (1.0 + g) + hshift
            A_im = params["A_im"][t][None] * (1.0 + g) + hshift
        else:
            raise ValueError(f"unknown pmode {self.pmode!r}")
        c_re = jnp.einsum("bd,bxde->bxe", v_re, A_re) - jnp.einsum(
            "bd,bxde->bxe", v_im, A_im
        )
        c_im = jnp.einsum("bd,bxde->bxe", v_re, A_im) + jnp.einsum(
            "bd,bxde->bxe", v_im, A_re
        )
        w = (c_re**2 + c_im**2).sum(-1)
        return c_re, c_im, jnp.log(jnp.maximum(w, 1e-30))

    @staticmethod
    def _select_norm(c_re, c_im, x):
        oh = jax.nn.one_hot(x, 4, dtype=c_re.dtype)  # one-hot select
        sel_re = jnp.einsum("bx,bxd->bd", oh, c_re)
        sel_im = jnp.einsum("bx,bxd->bd", oh, c_im)
        nrm = jax.lax.rsqrt(
            jnp.maximum((sel_re**2 + sel_im**2).sum(-1, keepdims=True), 1e-30)
        )
        return sel_re * nrm, sel_im * nrm

    # ---------------- forward ----------------

    def log_psi(self, params, bits: jax.Array) -> jax.Array:
        bits = bits.astype(jnp.int32)
        squeeze = bits.ndim == 1
        if squeeze:
            bits = bits[None]
        B = bits.shape[0]
        nb, d = self.n_blocks, self.dcut
        bb = self._backbone()
        vals = bits[:, 0::2] + 2 * bits[:, 1::2]
        tokens = jnp.concatenate(
            [jnp.full((B, 1), 4, jnp.int32), vals[:, :-1]], 1
        )
        # full causal pass for the per-block hidden states
        h_seq = bb._hidden_full(params["bb"], tokens)  # [B, nb, d_model]

        cum_a = jnp.cumsum(bits[:, 0::2], -1)
        cum_b = jnp.cumsum(bits[:, 1::2], -1)
        zeros = jnp.zeros((B, 1), cum_a.dtype)
        used_a = jnp.concatenate([zeros, cum_a[:, :-1]], 1)
        used_b = jnp.concatenate([zeros, cum_b[:, :-1]], 1)

        v_re = jnp.ones((B, d), self.dtype) / np.sqrt(d)
        v_im = jnp.zeros((B, d), self.dtype)
        log_amp = jnp.zeros((B,), self.dtype)
        phase = jnp.zeros((B,), self.dtype)
        for t in range(nb):
            c_re, c_im, logw = self._site_weights(
                params, t, h_seq[:, t], v_re, v_im
            )
            rem = nb - t - 1
            mask = mask_two_site(
                used_a[:, t], used_b[:, t], self.noa, self.nob, rem, rem
            )
            logp = apply_mask_logp(logw, mask)
            x = vals[:, t]
            oh = jax.nn.one_hot(x, 4, dtype=logp.dtype)
            log_amp = log_amp + 0.5 * (logp * oh).sum(-1)
            v_re, v_im = self._select_norm(c_re, c_im, x)
            z_re = v_re @ params["w_re"][t] - v_im @ params["w_im"][t] + params["c_re"][t]
            z_im = v_im @ params["w_re"][t] + v_re @ params["w_im"][t] + params["c_im"][t]
            from pynqs_tpu.ops.cplx import safe_atan2

            phase = phase + safe_atan2(z_im, z_re)  # bounded backward
        out = cplx.make(log_amp, phase)
        return out[0] if squeeze else out

    # ---------------- AR contract ----------------

    def ar_init(self, params, capacity: int):
        bb = self._backbone()
        kv = bb.ar_init(params["bb"], capacity)
        d = self.dcut
        return {
            "kv": kv,
            "v_re": jnp.ones((capacity, d), self.dtype) / np.sqrt(d),
            "v_im": jnp.zeros((capacity, d), self.dtype),
            "h_gpt": jnp.zeros((capacity, self.d_model), self.dtype),
        }

    def ar_step(self, params, carry, k: int, prev: jax.Array):
        bb = self._backbone()
        if k > 0:
            v_re, v_im = self._prev_select(params, carry, k - 1, prev)
        else:
            v_re, v_im = carry["v_re"], carry["v_im"]
        h_gpt, kv = bb._hidden_step(params["bb"], carry["kv"], k, prev)
        c_re, c_im, logw = self._site_weights(params, k, h_gpt, v_re, v_im)
        logp = logw - jax.scipy.special.logsumexp(logw, -1, keepdims=True)
        carry = {"kv": kv, "v_re": v_re, "v_im": v_im, "h_gpt": h_gpt}
        return logp, carry

    def _prev_select(self, params, carry, t_prev: int, prev):
        c_re, c_im, _ = self._site_weights(
            params, t_prev, carry["h_gpt"], carry["v_re"], carry["v_im"]
        )
        return self._select_norm(c_re, c_im, prev)
