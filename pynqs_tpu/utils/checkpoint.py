"""Checkpoint save/restore (reference _base.py:289-437 torch.save).

Orbax-backed: `{step, params, opt_state, history}` trees; restore
resumes model+optimizer+histories exactly.  `save_params`/`load_params`
give the reference's `read_model_only` warm-start path.
"""

from __future__ import annotations

import os

import jax

__all__ = ["save_checkpoint", "load_checkpoint", "save_params", "load_params"]


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, step: int, params, opt_state, history):
    path = os.path.abspath(path)
    tree = {
        "step": step,
        "params": params,
        "opt_state": opt_state,
        "history": list(history),
    }
    _ckptr().save(path, tree, force=True)


def load_checkpoint(path: str):
    """Returns the saved tree (arrays as numpy); caller re-device-puts."""
    return _ckptr().restore(os.path.abspath(path))


def save_params(path: str, params):
    _ckptr().save(os.path.abspath(path), params, force=True)


def load_params(path: str, like=None):
    restored = _ckptr().restore(os.path.abspath(path))
    if like is not None:
        restored = jax.tree.map(
            lambda r, l: r.astype(l.dtype).reshape(l.shape), restored, like
        )
    return restored
