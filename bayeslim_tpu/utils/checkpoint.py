"""
TPU-native training-state checkpointing via orbax.

The reference persists whole model trees as pickles (io.py:50-116) and
sampler chains as .npz (sampler.py:82-142) — both kept here for parity
(data/io.py, inference/sampler.py). This module adds what the reference
lacks: atomic, resumable TRAINING-STATE checkpoints (parameters +
optimizer state + step counter) through orbax, which handles sharded
arrays, async writes and retention natively on TPU pods.
"""
from __future__ import annotations

import os

import jax
import numpy as np

__all__ = ["save_train_state", "restore_train_state", "CheckpointManager"]


def _to_pytree(pdict):
    """ParamDict -> plain dict (orbax-friendly); passthrough otherwise."""
    return dict(pdict.items()) if hasattr(pdict, "items") else pdict


def save_train_state(path, pdict, opt_state=None, step=0, extra=None):
    """Atomically save a training state {params, opt_state, step, extra}
    to `path` (a directory)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(str(path))
    state = {"params": _to_pytree(pdict), "step": np.asarray(step)}
    if opt_state is not None:
        state["opt_state"] = opt_state
    if extra is not None:
        state["extra"] = extra
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def restore_train_state(path, like=None):
    """Restore a training state saved by save_train_state.

    like: optional template state (same structure, e.g. freshly built
    {params, opt_state, step}) so arrays restore with matching
    dtypes/shardings; without it, arrays restore as saved.
    Returns the state dict; wrap params back into a ParamDict with
    `ParamDict(state['params'])` if needed.
    """
    import orbax.checkpoint as ocp
    path = os.path.abspath(str(path))
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        like = dict(like)
        if "params" in like:
            like["params"] = _to_pytree(like["params"])
        return ckptr.restore(path, like)
    return ckptr.restore(path)


class CheckpointManager:
    """Periodic checkpointing with retention for training loops
    (the orbax-managed analog of the sampler's Ncheck .npz cadence).

    Example::

        mgr = CheckpointManager(dir, max_to_keep=3)
        for step in range(N):
            ...
            mgr.maybe_save(step, pdict, opt_state, every=100)
        state = mgr.restore_latest(like={...})
    """

    def __init__(self, directory, max_to_keep=3):
        import orbax.checkpoint as ocp
        self.directory = os.path.abspath(str(directory))
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))

    def maybe_save(self, step, pdict, opt_state=None, every=1, extra=None):
        if step % max(int(every), 1):
            return False
        import orbax.checkpoint as ocp
        state = {"params": _to_pytree(pdict), "step": np.asarray(step)}
        if opt_state is not None:
            state["opt_state"] = opt_state
        if extra is not None:
            state["extra"] = extra
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        return True

    def restore_latest(self, like=None):
        import orbax.checkpoint as ocp
        # orbax saves are async: finalize any in-flight save before
        # reading, or a save-then-resume can see a partial checkpoint
        self._mgr.wait_until_finished()
        step = self._mgr.latest_step()
        if step is None:
            return None
        if like is not None:
            like = dict(like)
            if "params" in like:
                like["params"] = _to_pytree(like["params"])
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(like))
        return self._mgr.restore(step)

    @property
    def latest_step(self):
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def close(self):
        self._mgr.close()
