"""VMC checkpoint-resume + GFMC on a trained NQS trial."""

import numpy as np
import jax
import pytest
import jax.numpy as jnp
import optax

import oracle
from pynqs_tpu.gfmc import GFMC, GFMCConfig
from pynqs_tpu.models.rnn import RNNWavefunction
from pynqs_tpu.optim.vmc import VMC, VMCConfig
from pynqs_tpu.sampler import ARSampler
from pynqs_tpu.utils import System
from pynqs_tpu.ops.integrals import decompress_h2e
from functools import partial


def _setup():
    sys = System.hubbard_1d(4, 2, 2, u=4.0)
    dets = oracle.fci_space(sys.sorb, sys.noa, sys.nob)
    H = oracle.dense_h(dets, sys.h1e, decompress_h2e(sys.h2e, sys.sorb))
    e0 = np.linalg.eigvalsh(H)[0]
    model = RNNWavefunction(sys.sorb, sys.noa, sys.nob, hidden=16, phase_hidden=16)
    sampler = ARSampler(sys.sorb, sys.noa, sys.nob, n_sample=1 << 13, capacity=36)
    return sys, model, sampler, e0


def test_vmc_checkpoint_resume(tmp_path):
    sys, model, sampler, e0 = _setup()
    ckpt = str(tmp_path / "ck")
    cfg = VMCConfig(
        n_iter=40, use_sr=True, sr_damping=1e-2, optimizer=optax.sgd(5e-2),
        log_every=10**6, checkpoint_path=ckpt, checkpoint_interval=40,
    )
    vmc = VMC(model, sys, sampler, cfg)
    p1, hist1 = vmc.run(jax.random.PRNGKey(3))
    assert len(hist1) == 40

    # resume continues the history and keeps improving
    vmc2 = VMC(model, sys, sampler, cfg)
    p2, hist2 = vmc2.run(
        jax.random.PRNGKey(4), n_iter=40, resume_from=ckpt
    )
    assert len(hist2) == 80
    assert hist2[:40] == hist1
    assert np.mean(hist2[-10:]) < np.mean(hist1[-10:]) + 1e-6


@pytest.mark.slow
def test_gfmc_improves_trained_nqs():
    sys, model, sampler, e0 = _setup()
    vmc = VMC(
        model, sys, sampler,
        VMCConfig(
            n_iter=120, use_sr=True, sr_damping=1e-2,
            optimizer=optax.sgd(5e-2), log_every=10**6,
        ),
    )
    params, hist = vmc.run(jax.random.PRNGKey(3))
    e_vmc = float(np.mean(hist[-10:]))
    assert e_vmc > e0  # variational, not converged at 120 iters

    # GFMC with the NQS itself as trial wavefunction
    # NOTE: fixed-node needs an (effectively) real trial; the RNN's
    # learned phase field is near-constant on this system
    trial = partial(model.log_psi, params)
    bits, w, _lp, _ = sampler.sample(model, params, jax.random.PRNGKey(7))
    counts = (np.asarray(w) * 4096).astype(int)
    walkers = np.repeat(np.asarray(bits), np.maximum(counts, 0), axis=0)[:512]
    if walkers.shape[0] < 512:
        walkers = np.concatenate(
            [walkers, np.repeat(walkers[:1], 512 - walkers.shape[0], 0)]
        )
    g = GFMC(
        trial, sys,
        GFMCConfig(n_walkers=512, n_iter=150, p_steps=8, branch_interval=10),
    )
    out = g.run(walkers, key=jax.random.PRNGKey(8))
    from pynqs_tpu.gfmc.walker import mixed_energy

    e_mix = mixed_energy(out, 8, tail=70)[0]
    # mixed estimator with projection should improve on the VMC energy
    assert e_mix < e_vmc + 1e-9, (e_mix, e_vmc)
    assert e_mix > e0 - 0.05  # sane (fixed-node variational up to stats)
