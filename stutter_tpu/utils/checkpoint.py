"""Orbax training checkpoints (SURVEY.md §5.4).

The reference's "checkpointing" is three layered filesystem caches (cleaned
WAVs, feature .npy, model pickles) — those are preserved in cache.py and
persist.py.  This module adds what the reference lacks: resumable TRAINING
state (params + optimizer state + step) through Orbax, so long sequence-model
runs survive preemption.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax
import numpy as np


def _manager(ckpt_dir: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        Path(ckpt_dir).absolute(),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_train_state(ckpt_dir: str, step: int, params, opt_state) -> None:
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir)
    mgr.save(
        step,
        args=ocp.args.Composite(
            params=ocp.args.StandardSave(params),
            opt_state=ocp.args.StandardSave(opt_state),
        ),
    )
    mgr.wait_until_finished()


def latest_step(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    import orbax.checkpoint as ocp

    return _manager(ckpt_dir).latest_step()


def restore_train_state(ckpt_dir: str, step: int, params_like, opt_state_like):
    """Restore (params, opt_state) using templates for structure/dtypes."""
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir)
    restored = mgr.restore(
        step,
        args=ocp.args.Composite(
            params=ocp.args.StandardRestore(params_like),
            opt_state=ocp.args.StandardRestore(opt_state_like),
        ),
    )
    return restored["params"], restored["opt_state"]
