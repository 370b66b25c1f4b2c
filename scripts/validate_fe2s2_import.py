"""Validate the DMRG (FOCUS dcut=20) import: VMC energy of the
imported Graph-MPS-RNN state on the Fe2S2 active space.

A faithful import should give E ≈ the DMRG dcut=20 energy, close to
the reference e_lst = -116.6056 Ha (FCI-quality).  Run on TPU (f32).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from pynqs_tpu.energy.eloc import local_energy_reduce, local_energy_simple
from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN
from pynqs_tpu.sampler.ar import ar_sampling
from pynqs_tpu.utils import System
from pynqs_tpu.utils.mps_import import load_focus_mpsrnn


def main():
    f32 = jax.default_backend() != "cpu"
    dtype = np.float32 if f32 else np.float64
    sys = System.from_pth(
        "/root/reference/example/Fe2S2/fe2s2-OO.pth", dtype=dtype
    )
    print(f"e_ref = {sys.e_ref}", flush=True)
    model = GraphMPSRNN(
        sys.sorb, sys.noa, sys.nob, dcut=20,
        phase_mode="arg", norm_mode="mpsrnn",
        dtype=jnp.float32 if f32 else jnp.float64,
    )
    params = load_focus_mpsrnn(
        "/root/reference/example/Fe2S2/fe2s2-OO-dcut-20-focus-1e-8.pth", model
    )

    t0 = time.time()
    cap = 1024
    bits, counts, dropped = ar_sampling(
        model, params, jax.random.PRNGKey(0), 200_000, capacity=cap
    )
    counts = np.asarray(counts)
    kept = counts.sum()
    print(
        f"sampling: {int((counts > 0).sum())} unique, kept {kept}/200000, "
        f"t={time.time() - t0:.1f}s", flush=True,
    )
    w = jnp.asarray(counts / kept)

    ops = sys.tables.astuple()
    hpair = sys.tables.hpair
    t0 = time.time()
    eloc = local_energy_reduce(
        partial(model.log_psi, params),
        bits,
        ops,
        sys.excitation,
        jax.random.PRNGKey(1),
        k_det=1024,
        n_stoch=256,
        batch=256,
        hpair=hpair,
    )
    eloc = np.asarray(eloc)
    alive = np.asarray(w) > 0
    e = float((np.asarray(w)[alive] * eloc[alive, 0]).sum())
    var = float(
        (np.asarray(w)[alive] * (eloc[alive, 0] - e) ** 2).sum()
    )
    print(f"eloc t={time.time() - t0:.1f}s", flush=True)
    print(f"E(import) = {e + sys.ecore:.6f} Ha   sigma^2 = {var:.4f}")
    if sys.e_ref is not None:
        print(f"Delta vs e_ref = {(e + sys.ecore - sys.e_ref) * 1000:+.1f} mHa")


if __name__ == "__main__":
    main()
