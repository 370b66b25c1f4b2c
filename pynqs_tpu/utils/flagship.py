"""Fe2S2 flagship model/system builders shared by the run/eval scripts.

The flagship ladder (reference example/Fe2S2/Fe2S2-OO-dcut-20.py) is a
Graph-MPS-RNN over the 20 OO-ordered spatial orbitals.  Round-3 adds
the structured variant (extra max-|K| predecessor edges + compressed
tensor coupling, reference graph_mpsrnn.py:872-981); every script that
loads a structured checkpoint must rebuild the SAME graph, so the
construction lives here instead of being copy-pasted per script.
"""

from __future__ import annotations

import numpy as np

FE2S2_PTH = "/root/reference/example/Fe2S2/fe2s2-OO.pth"


def fe2s2_system(dtype=np.float32):
    from pynqs_tpu.utils import System

    return System.from_pth(FE2S2_PTH, dtype=dtype)


def flagship_graph(system, max_preds: int):
    """The deterministic multi-predecessor DAG used by the round-3
    structured runs: identity site order (keeps chain-checkpoint warm
    starts exact) + extra max-|K| exchange edges."""
    if max_preds <= 1:
        return None
    from pynqs_tpu.utils.graph import dag_from_order, exchange_matrix

    Kx = exchange_matrix(system.h2e, system.sorb)
    return dag_from_order(
        list(range(system.sorb // 2)), Kx, max_preds=max_preds
    )


def flagship_model(system, dcut: int, *, use_tensor: bool = False,
                   max_preds: int = 1, dtype=None):
    import jax.numpy as jnp

    from pynqs_tpu.models.graph_mps_rnn import GraphMPSRNN

    return GraphMPSRNN(
        system.sorb, system.noa, system.nob, dcut=dcut,
        graph=flagship_graph(system, max_preds),
        phase_mode="arg", norm_mode="mpsrnn",
        dtype=dtype if dtype is not None else jnp.float32,
        use_tensor=use_tensor,
    )
