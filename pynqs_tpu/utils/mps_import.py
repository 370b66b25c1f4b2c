"""DMRG → Graph-MPS-RNN warm start.

Loads the reference's converted FOCUS MPS parameter files (the output
of `Fmps2mpsrnn`, utils/mps_helper/focus_helper.py:11-73, stored as a
torch state dict with keys ``module.params_M.all_sites`` (list of
per-edge complex tensors [4, Dout, Din, 2], last entry = the boundary
M applied to the all-ones left boundary), ``module.params_w.all_sites``
[norb, dcut, 2] and ``module.params_c.all_sites`` [norb, 2]) into a
:class:`pynqs_tpu.models.graph_mps_rnn.GraphMPSRNN` parameter pytree.

The target model must use the reference conventions:
``phase_mode="arg"``, ``norm_mode="mpsrnn"``, chain graph in the same
site order the MPS was converted with (identity for the Fe2S2
example).  Bond dimensions smaller than dcut are zero-padded
(top-left block), exactly like the reference's fill_M
(graph_mpsrnn.py:528-554).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = [
    "load_focus_mpsrnn",
    "load_renormalizer_mpsrnn",
    "mpsrnn_params_from_state_dict",
    "grow_dcut",
    "structural_warm_start",
]


def grow_dcut(params: dict, model_old, model_new, *, exact: bool = True,
              fresh_scale: float = 1e-3, key=None) -> dict:
    """Pad Graph-MPS-RNN parameters from a smaller dcut to a larger
    one (reference dcut-growing pad, graph_mpsrnn.py:483-527):
    warm-starts a higher-bond-dimension run from a converged smaller
    one.

    With ``exact=True`` (default) and ``norm_mode="mpsrnn"`` the grow
    is wavefunction-preserving up to O(fresh_scale²): the mpsrnn gauge
    divides by the RMS over (4, dcut), so zero-padding scales every
    site's post-gauge hidden by γ = sqrt(d_new/d_old); compensating
    everything that *reads* a hidden (M, U, w_arg/w_ph) by 1/γ makes
    the represented state exact.  The padded entries additionally get
    ``fresh_scale`` × a fresh init so they are not an exact saddle
    (grad of an exactly-zero block through |h|² readouts is zero) —
    EXCEPT the phase-readout tensors (w_arg/w_ph/c_*), whose padding
    stays exactly zero: trained states hold z_t ≡ 0 at most sites (all
    phase on the terminal site), and noise there turns atan2(0, 0)
    into a random per-determinant angle — a catastrophic, noise-scale-
    independent phase scrambling of the warm start.
    """
    import jax

    d0, d1 = model_old.dcut, model_new.dcut
    if d1 < d0:
        raise ValueError("grow_dcut only grows")
    if key is None:
        key = jax.random.PRNGKey(11)
    init = model_new.init(key)
    gamma = float(np.sqrt(d1 / d0))
    # params whose contraction includes a (gauge-normalized) hidden:
    # compensate the old block by 1/γ under the mpsrnn mean-gauge
    reads_hidden = ("M_re", "M_im", "U_re", "U_im",
                    "w_arg_re", "w_arg_im", "w_ph")
    # phase readouts: padded region must stay exactly 0 (see docstring)
    phase_keys = ("w_arg_re", "w_arg_im", "w_ph",
                  "c_arg_re", "c_arg_im", "c_ph")
    compensate = exact and getattr(model_new, "norm_mode", None) == "mpsrnn"
    out = {}
    for k, v in init.items():
        v = np.asarray(v)
        fs = 0.0 if k in phase_keys else fresh_scale
        if k not in params:
            out[k] = jnp.asarray(v * fs, model_new.dtype)
            continue
        pv = np.asarray(params[k])
        if pv.shape == v.shape:
            out[k] = jnp.asarray(pv, model_new.dtype)
            continue
        tgt = v * fs
        sl = tuple(slice(0, s) for s in pv.shape)
        tgt[sl] = pv / gamma if (compensate and k in reads_hidden) else pv
        out[k] = jnp.asarray(tgt, model_new.dtype)
    return out


def _strip(key_dict):
    out = {}
    for k, v in key_dict.items():
        out[k.replace("module.", "").replace("sample.", "")] = v
    return out


def load_focus_mpsrnn(path: str, model):
    """Build model params warm-started from a converted FOCUS MPS file.

    ``model``: a GraphMPSRNN with chain graph, phase_mode="arg",
    norm_mode="mpsrnn".  Returns a params pytree (float; complex data
    split into re/im).  For RAW FOCUS CTNS binaries use
    :func:`pynqs_tpu.utils.focus_ctns.load_focus_ctns_mpsrnn`.
    """
    from pynqs_tpu.utils.torch_io import safe_torch_load

    sd = safe_torch_load(path)
    if "model" in sd:
        sd = sd["model"]
    return mpsrnn_params_from_state_dict(_strip(sd), model)


def mpsrnn_params_from_state_dict(sd: dict, model):
    """Converted-layout state dict (``params_M.all_sites`` list of
    [4, Dout, Din, 2] with the boundary M last, ``params_w.all_sites``
    [norb, dcut_f, 2], ``params_c.all_sites`` [norb, 2]) → GraphMPSRNN
    parameter pytree.  Shared by the converted-file and raw-CTNS
    loaders."""
    import jax

    M_list = sd["params_M.all_sites"]
    w = np.asarray(sd["params_w.all_sites"])  # [norb, dcut_f, 2]
    c = np.asarray(sd["params_c.all_sites"])  # [norb, 2]

    norb, d = model.norb, model.dcut
    if model.maxp != 1:
        raise ValueError("FOCUS import requires a chain graph (maxp == 1)")
    if len(M_list) != norb:
        raise ValueError(
            f"file has {len(M_list)} site tensors, model has {norb} sites"
        )

    params = jax.tree.map(lambda x: np.zeros_like(np.asarray(x)), model.init(jax.random.PRNGKey(0)))
    M_re = np.zeros((norb, 1, 4, d, d))
    M_im = np.zeros((norb, 1, 4, d, d))
    v_re = np.zeros((norb, 4, d))
    v_im = np.zeros((norb, 4, d))

    # boundary: last entry, applied to the all-ones boundary vector;
    # Din columns beyond the file's are zero, so M @ 1 = row-sum.
    Mb = np.asarray(M_list[-1])  # [4, Dout, Din, 2]
    bound = Mb.sum(axis=2)  # [4, Dout, 2]
    v_re[0, :, : bound.shape[1]] = bound[..., 0]
    v_im[0, :, : bound.shape[1]] = bound[..., 1]

    for t in range(1, norb):
        Mt = np.asarray(M_list[t - 1])  # [4, Dout, Din, 2]
        do, di = Mt.shape[1], Mt.shape[2]
        M_re[t, 0, :, :do, :di] = Mt[..., 0]
        M_im[t, 0, :, :do, :di] = Mt[..., 1]

    dcut_f = w.shape[1]
    w_re = np.zeros((norb, d))
    w_im = np.zeros((norb, d))
    w_re[:, :dcut_f] = w[..., 0]
    w_im[:, :dcut_f] = w[..., 1]

    params["M_re"] = jnp.asarray(M_re, model.dtype)
    params["M_im"] = jnp.asarray(M_im, model.dtype)
    params["v_re"] = jnp.asarray(v_re, model.dtype)
    params["v_im"] = jnp.asarray(v_im, model.dtype)
    params["w_arg_re"] = jnp.asarray(w_re, model.dtype)
    params["w_arg_im"] = jnp.asarray(w_im, model.dtype)
    params["c_arg_re"] = jnp.asarray(c[:, 0], model.dtype)
    params["c_arg_im"] = jnp.asarray(c[:, 1], model.dtype)
    # uniform metric (reference eta = 1/sqrt(2) constant): any constant
    # is amplitude-equivalent; softplus(1)=1.31 uniform works
    params["eta"] = jnp.ones((norb, 4, d), model.dtype)
    params["global_phase"] = jnp.zeros((), model.dtype)
    return params


def structural_warm_start(params: dict, model_new, *, key=None,
                          fresh_scale: float = 1e-2) -> dict:
    """Re-express a trained parameter pytree in a STRUCTURALLY larger
    model (extra predecessor slots from a multi-pred DAG, tensor
    coupling K/U, …) without changing the represented wavefunction
    more than O(fresh_scale).

    Shared tensors carry over; tensors whose shape grew are zero-slot
    embedded (the checkpoint block in the leading corner, the fresh
    remainder at ``fresh_scale`` × a fresh init); tensors absent from
    the checkpoint (e.g. ``K_re``/``U_re`` when turning on use_tensor)
    start at ``fresh_scale`` × init — near zero, so the new couplings
    switch on smoothly under training.  The reference grows structure
    the same way (graph_mpsrnn.py:483-554 pad + near-zero fill).
    """
    import jax

    if key is None:
        key = jax.random.PRNGKey(7)
    params = {k: np.asarray(v) for k, v in params.items()}
    init = model_new.init(key)
    merged = {}
    for k, v in init.items():
        v = np.asarray(v)
        if k in params and params[k].shape == v.shape:
            merged[k] = params[k]
        elif k in params:
            pv = params[k]
            if pv.ndim != v.ndim:
                raise ValueError(
                    f"{k}: rank mismatch {pv.shape} vs {v.shape}"
                )
            tgt = v * fresh_scale
            sl = tuple(slice(0, s) for s in pv.shape)
            tgt[sl] = pv
            merged[k] = tgt
        else:
            merged[k] = v * fresh_scale
    return {k: jnp.asarray(v, jnp.float32) for k, v in merged.items()}


def load_renormalizer_mpsrnn(path_or_tensors, model):
    """Renormalizer DMRG warm start (reference Rmps2mpsrnn artifact).

    The reference's Renormalizer pipeline
    (utils/mps_helper/renormalizer_helper.py:74-78) torch-saves the
    optimized MPS as a list of 1-SITE tensors [l, 2, r] over SPIN
    orbitals.  Its mps2mpsrnn (:95-185) contracts spin-orbital pairs to
    2-site tensors [l, 4, r], remaps the tensor-product order
    [0,1,2,3] -> [0,2,1,3] (renormalizer basis -> the model's
    x = n_alpha + 2 n_beta), and packs the converted-file structure.
    This is the same conversion running on the saved artifact (or an
    in-memory list of numpy arrays) without renormalizer installed.
    """
    if isinstance(path_or_tensors, str):
        from pynqs_tpu.utils.torch_io import safe_torch_load

        ts = [np.asarray(t) for t in safe_torch_load(path_or_tensors)]
    else:
        ts = [np.asarray(t) for t in path_or_tensors]
    if len(ts) % 2:
        raise ValueError("expected an even number of 1-site tensors "
                         "(two spin orbitals per spatial site)")
    sites = []
    for i in range(0, len(ts), 2):
        m1, m2 = ts[i], ts[i + 1]
        m = np.einsum("iak,kbj->iabj", m1, m2).reshape(
            m1.shape[0], 4, m2.shape[-1]
        )
        sites.append(np.ascontiguousarray(m[:, [0, 2, 1, 3], :]))
    from pynqs_tpu.utils.focus_ctns import ctns_state_dict

    # already in the converted 4-basis order -> identity permutation
    sd = ctns_state_dict(sites, phys=np.arange(4))
    return mpsrnn_params_from_state_dict(sd, model)
