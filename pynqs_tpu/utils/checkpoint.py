"""Checkpoint save/restore (reference _base.py:289-437 torch.save).

Format: a pickled pytree with all leaves converted to host numpy
arrays — topology-independent (checkpoints written on TPU restore on
CPU and vice versa), the same class of format as the reference's
torch.save files.  (Orbax was tried first: restoring TPU-written
trees on CPU requires sharding metadata this backend doesn't emit.)

`save_checkpoint`/`load_checkpoint` carry {step, params, opt_state,
history}; `save_params`/`load_params` give the reference's
`read_model_only` warm-start path.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import jax

__all__ = ["save_checkpoint", "load_checkpoint", "save_params", "load_params"]


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _path(path: str) -> str:
    path = os.path.abspath(path)
    if os.path.isdir(path):  # legacy orbax directory
        raise ValueError(
            f"{path} is an orbax directory checkpoint; re-save with the "
            "current pickle format"
        )
    return path if path.endswith(".pkl") else path + ".pkl"


def save_checkpoint(path: str, step: int, params, opt_state, history,
                    extra: dict | None = None):
    tree = {
        "step": step,
        "params": _to_numpy(params),
        "opt_state": _to_numpy(opt_state),
        "history": list(history),
    }
    if extra:
        tree.update({k: _to_numpy(v) for k, v in extra.items()})
    with open(_path(path), "wb") as f:
        pickle.dump(tree, f)


def load_checkpoint(path: str):
    """Returns the saved tree (arrays as numpy); caller re-device-puts."""
    with open(_path(path), "rb") as f:
        return pickle.load(f)


def save_params(path: str, params):
    with open(_path(path), "wb") as f:
        pickle.dump(_to_numpy(params), f)


def load_params(path: str, like=None):
    with open(_path(path), "rb") as f:
        restored = pickle.load(f)
    if like is not None:
        import jax.numpy as jnp

        restored = jax.tree.map(
            lambda l, r: jnp.asarray(r, l.dtype).reshape(l.shape),
            like,
            restored,
        )
    return restored
