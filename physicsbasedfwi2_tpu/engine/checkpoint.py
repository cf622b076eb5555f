"""Full train-state checkpointing with orbax.

The reference checkpoints only network weights (base_model.py:154-170)
— optimizer/scheduler state is lost on resume (SURVEY.md §5).  Here
the full state (params + optimizer + epoch + rng) round-trips.
"""

from __future__ import annotations

import os

import numpy as np


def save_state(path: str, state: dict):
    """Checkpoint a pytree dict {params, opt_state, epoch, ...}."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore_state(path: str, template: dict) -> dict:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)


def save_engine(engine, path: str, *, epoch: int = 0):
    state = {"params": engine.params, "opt_state": engine.opt_state,
             "epoch": np.asarray(epoch)}
    save_state(path, state)


def restore_engine(engine, path: str) -> int:
    template = {"params": engine.params, "opt_state": engine.opt_state,
                "epoch": np.asarray(0)}
    state = restore_state(path, template)
    engine.params = state["params"]
    engine.opt_state = state["opt_state"]
    return int(state["epoch"])
