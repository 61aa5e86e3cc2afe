"""Native (orbax) checkpointing — full training state, preemption-safe.

Capability upgrade over the reference's .pth.tar saves (ref:
train.py:137-140), which drop optimizer state on resume: here params,
BN state, optimizer state, AND the epoch/step counter round-trip, so resume
is exact. The torch-compatible exporter (torch_import.save_torch_checkpoint)
remains the interchange format with the upstream code.
"""
from __future__ import annotations

import os


def _manager(directory: str, max_to_keep: int = 5):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True),
    )


def save_checkpoint(directory: str, step: int, params, model_state=None,
                    opt_state=None, max_to_keep: int = 5,
                    meta: dict | None = None) -> None:
    """``meta``: small dict of ints (epoch, global_step, ...) stored alongside
    the arrays — used by the mid-epoch preemption saves to know which epoch to
    restart on resume."""
    import numpy as np
    import orbax.checkpoint as ocp

    mgr = _manager(directory, max_to_keep)
    state = {"params": params}
    if model_state is not None:
        state["model_state"] = model_state
    if opt_state is not None:
        state["opt_state"] = opt_state
    if meta is not None:
        state["meta"] = {k: np.asarray(v) for k, v in meta.items()}
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def restore_checkpoint(directory: str, step: int | None = None,
                       template=None):
    """Returns (state_dict, step). ``template`` (a matching pytree of arrays)
    enables exact dtype/sharding restoration."""
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    if step is None:
        step = mgr.latest_step()
    if template is not None:
        restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    else:
        restored = mgr.restore(step)
    mgr.close()
    return restored, step


def read_meta(directory: str, step: int) -> dict | None:
    """Read the ``meta`` dict of a checkpoint (full restore, meta extracted —
    checkpoints here are small, a partial read isn't worth the machinery)."""
    restored, _ = restore_checkpoint(directory, step)
    meta = restored.get("meta")
    if meta is None:
        return None
    return {k: int(v) for k, v in meta.items()}


def latest_step(directory: str) -> int | None:
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step
