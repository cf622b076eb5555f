"""Mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None,
              axis_name: str = "shot") -> Mesh:
    """1D device mesh over the FWI shot axis.

    Shots are FWI's embarrassingly parallel axis (the reference fans
    them out over Ray GPUs / DENISE MPI ranks); on TPU they shard
    over ICI with a single psum for the gradient reduction.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def shot_axis_size(mesh: Mesh, axis_name: str = "shot") -> int:
    return mesh.shape[axis_name]
