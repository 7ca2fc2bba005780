"""Checkpoint / resume via orbax.

The reference has no persistence at all (SURVEY.md §5 — early stopping keeps
no weights); this is new capability mandated by the framework goal: every
trainer's (params, opt_state, extras) pytree can be saved and restored.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax


def save_checkpoint(path: str, state: Any, step: int = 0) -> str:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    path.mkdir(parents=True, exist_ok=True)
    with ocp.CheckpointManager(str(path)) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()
    return str(path / str(step))


def restore_checkpoint(path: str, template: Any,
                       step: Optional[int] = None) -> Any:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.CheckpointManager(str(path)) as mgr:
        step = step if step is not None else mgr.latest_step()
        return mgr.restore(step, args=ocp.args.StandardRestore(template))


def latest_step(path: str) -> Optional[int]:
    """Latest saved step under `path`, or None when no checkpoint exists."""
    import orbax.checkpoint as ocp

    p = Path(path).absolute()
    if not p.is_dir():
        return None
    with ocp.CheckpointManager(str(p)) as mgr:
        return mgr.latest_step()
