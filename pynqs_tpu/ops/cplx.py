"""Complex-free wavefunction-value arithmetic (TPU mandatory).

The TPU backend implements NO complex-dtype ops at all (not even add),
so the framework-wide convention is:

    log ψ  ≡  a real array `lp[..., 2]`:  lp[..., 0] = log|ψ|,
                                          lp[..., 1] = arg ψ.

Everything here is elementwise real math (exp/cos/sin/atan2) that XLA
fuses into surrounding kernels.  `to_np_complex` is for host-side
tests/analysis only.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "make",
    "logabs",
    "phase",
    "to_np_complex",
    "from_np_complex",
    "exp_pair",
    "ratio_re_im",
    "add_exp",
    "scale",
]


def make(logabs, phase):
    return jnp.stack([logabs, phase], axis=-1)


def logabs(lp):
    return lp[..., 0]


def phase(lp):
    return lp[..., 1]


def to_np_complex(lp) -> np.ndarray:
    """Host-side: log ψ as a numpy complex array (log|ψ| + i·arg)."""
    a = np.asarray(lp)
    return a[..., 0] + 1j * a[..., 1]


def from_np_complex(logpsi: np.ndarray):
    """Host-side: numpy complex log ψ -> pair array."""
    return np.stack([np.real(logpsi), np.imag(logpsi)], axis=-1)


def exp_pair(lp):
    """ψ itself as (re, im) real arrays."""
    r = jnp.exp(lp[..., 0])
    return r * jnp.cos(lp[..., 1]), r * jnp.sin(lp[..., 1])


def ratio_re_im(lp_num, lp_den):
    """(re, im) of exp(lp_num − lp_den)."""
    d0 = lp_num[..., 0] - lp_den[..., 0]
    d1 = lp_num[..., 1] - lp_den[..., 1]
    r = jnp.exp(d0)
    return r * jnp.cos(d1), r * jnp.sin(d1)


def add_exp(lp1, lp2, c1=1.0, c2=1.0):
    """log(c1·exp(lp1) + c2·exp(lp2)) as a pair, overflow-safe."""
    m = jnp.maximum(lp1[..., 0], lp2[..., 0])
    r1 = c1 * jnp.exp(lp1[..., 0] - m)
    r2 = c2 * jnp.exp(lp2[..., 0] - m)
    re = r1 * jnp.cos(lp1[..., 1]) + r2 * jnp.cos(lp2[..., 1])
    im = r1 * jnp.sin(lp1[..., 1]) + r2 * jnp.sin(lp2[..., 1])
    mag2 = re**2 + im**2
    return make(
        m + 0.5 * jnp.log(jnp.maximum(mag2, 1e-30)), safe_atan2(im, re)
    )


def scale(lp, log_c: float = 0.0, phase_c: float = 0.0):
    """Multiply ψ by a constant c = exp(log_c + i·phase_c)."""
    return make(lp[..., 0] + log_c, lp[..., 1] + phase_c)


@jax.custom_jvp
def safe_atan2(y, x):
    """atan2 with a magnitude-floored derivative.

    d atan2 = (x·dy − y·dx)/(x²+y²) diverges as |z| → 0; one NaN/inf
    poisons the whole parameter pytree.  Forward value is exact; the
    derivative denominator is floored.  Defined through custom_jvp
    (linear in the tangents) so BOTH forward-mode (the CG-SR matvecs)
    and reverse-mode (grad transposes the jvp) work."""
    return jnp.arctan2(y, x)


@safe_atan2.defjvp
def _safe_atan2_jvp(primals, tangents):
    y, x = primals
    dy, dx = tangents
    m2 = jnp.maximum(x * x + y * y, 1e-12)
    return jnp.arctan2(y, x), (x * dy - y * dx) / m2


# ---- stable log(2·f(θ)) for complex θ given as (re, im) pairs ----


def log2cosh_pair(x, y):
    """(log|2cosh(x+iy)|, arg) — |cosh z|² = (cosh 2x + cos 2y)/2."""
    a = 2.0 * jnp.abs(x)
    la = 0.5 * (
        a
        + jnp.log1p(jnp.exp(-2.0 * a) + 2.0 * jnp.cos(2.0 * y) * jnp.exp(-a))
    ) - 0.5 * np.log(4.0) + np.log(2.0)
    ph = jnp.arctan2(jnp.tanh(x) * jnp.sin(y), jnp.cos(y))
    return la, ph


def log2cos_pair(x, y):
    """(log|2cos(x+iy)|, arg) — |cos z|² = (cosh 2y + cos 2x)/2."""
    a = 2.0 * jnp.abs(y)
    la = 0.5 * (
        a
        + jnp.log1p(jnp.exp(-2.0 * a) + 2.0 * jnp.cos(2.0 * x) * jnp.exp(-a))
    ) - 0.5 * np.log(4.0) + np.log(2.0)
    ph = jnp.arctan2(-jnp.sin(x) * jnp.tanh(y), jnp.cos(x))
    return la, ph


def log2tanh_pair(x, y):
    """(log|2tanh(x+iy)|, arg) via tanh z = (tanh x + i tan y)/(1 + i tanh x tan y)."""
    tx, ty = jnp.tanh(x), jnp.tan(y)
    num_l = 0.5 * jnp.log(jnp.maximum(tx**2 + ty**2, 1e-30))
    num_p = jnp.arctan2(ty, tx)
    den_l = 0.5 * jnp.log1p((tx * ty) ** 2)
    den_p = jnp.arctan2(tx * ty, jnp.ones_like(tx))
    return num_l - den_l + np.log(2.0), num_p - den_p
