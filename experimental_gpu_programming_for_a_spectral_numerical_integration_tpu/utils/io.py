"""Result persistence + training-state checkpointing (SURVEY §5 aux rows).

The reference runs <1 ms of math and persists nothing; at this framework's
scale (100k-rod sweeps, continuation studies, calibration training) results
and training state need to survive the process:

* :func:`save_results` / :func:`load_results` — compressed ``.npz`` for
  sweep outputs (host NumPy; device arrays are fetched once, explicitly).
* :func:`save_train_state` / :func:`restore_train_state` — Orbax
  checkpointing of calibration/optimizer pytrees (checkpoint/resume for
  long-running fits).
"""

from __future__ import annotations

import pathlib

import numpy as np
import jax

__all__ = [
    "save_results",
    "load_results",
    "save_train_state",
    "restore_train_state",
]


def save_results(path, **arrays):
    """Save named arrays (device or host) as one compressed ``.npz``."""
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    host = {k: np.asarray(v) for k, v in arrays.items()}
    np.savez_compressed(path, **host)
    return path


def load_results(path) -> dict:
    with np.load(path) as data:
        return {k: data[k] for k in data.files}


def save_train_state(path, state) -> None:
    """Checkpoint an arbitrary pytree (params/opt_state) with Orbax."""
    import orbax.checkpoint as ocp

    path = pathlib.Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore_train_state(path, like):
    """Restore a pytree checkpoint; ``like`` provides structure/dtypes."""
    import orbax.checkpoint as ocp

    path = pathlib.Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    target = jax.tree.map(ocp.utils.to_shape_dtype_struct, like) \
        if hasattr(ocp.utils, "to_shape_dtype_struct") else like
    return ckptr.restore(path, target)
