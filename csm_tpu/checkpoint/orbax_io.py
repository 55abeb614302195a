"""Native checkpointing via orbax: ``{params, opt_state, step}`` bundles with
retention (the TPU-side equivalent of HF Trainer's ``save_total_limit``
rotation, ``train.py:263-264``) and resume-from-latest."""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def _manager(directory: str, max_to_keep: Optional[int] = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(
    directory: str,
    step: int,
    state: Any,
    max_to_keep: Optional[int] = 3,
    wait: bool = True,
) -> None:
    """Save a pytree ``state`` at ``step`` (async under the hood; ``wait``
    blocks until durable)."""
    mgr = _manager(directory, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    if wait:
        mgr.wait_until_finished()
    mgr.close()


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory, None)
    step = mgr.latest_step()
    mgr.close()
    return step


def load_checkpoint(
    directory: str, step: Optional[int] = None, template: Optional[Any] = None
) -> Any:
    """Restore the pytree saved at ``step`` (defaults to latest).  With a
    ``template`` pytree, leaves are restored with its shapes/dtypes/shardings."""
    mgr = _manager(directory, None)
    if step is None:
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {directory}")
    if template is not None:
        restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    else:
        restored = mgr.restore(step)
    mgr.close()
    return restored
