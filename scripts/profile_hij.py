"""TPU profile of the fused Slater-Condon kernel + eloc (Fe2S2)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from pynqs_tpu.energy.eloc import local_energy_simple
from pynqs_tpu.models.rbm import RBM
from pynqs_tpu.ops import onv
from pynqs_tpu.ops.hamiltonian import comb_hij
from pynqs_tpu.utils import System


def bench(name, fn, *args, reps=10):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt * 1000:.2f} ms", flush=True)
    return dt


def main():
    sys_ = System.from_pth(
        "/root/reference/example/Fe2S2/fe2s2-OO.pth", dtype=np.float32
    )
    model = RBM(sorb=sys_.sorb, alpha=2, param_type="complex", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    ops = tuple(
        jnp.asarray(np.asarray(t), jnp.float32) for t in sys_.tables.astuple()
    )
    tab = sys_.excitation
    B = 512
    hf = jnp.asarray(onv.hf_bits(sys_.sorb, sys_.noa, sys_.nob))
    bits = jnp.broadcast_to(hf, (B, sys_.sorb)).astype(jnp.int8)

    f_hij = jax.jit(lambda b: comb_hij(b, *ops, table=tab, with_comb=False)[1])
    f_comb = jax.jit(lambda b: comb_hij(b, *ops, table=tab, with_comb=True))
    f_eloc = jax.jit(
        lambda b: local_energy_simple(
            partial(model.log_psi, params), b, ops, tab, batch=128
        )
    )
    bench("hij only (B=512)", f_hij, bits)
    bench("comb+hij (B=512)", f_comb, bits)
    bench("full eloc (B=512)", f_eloc, bits)


if __name__ == "__main__":
    main()
