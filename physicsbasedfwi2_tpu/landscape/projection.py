"""Optimization-trajectory PCA.

Reference: loss_landscape/projection.py + plot_trajectory.py —
project checkpointed weight trajectories onto their top principal
directions for plotting over the loss surface.
"""

from __future__ import annotations

import jax
import numpy as np


def _flatten(params) -> np.ndarray:
    return np.concatenate([np.asarray(l).ravel()
                           for l in jax.tree_util.tree_leaves(params)])


def trajectory_pca(param_history, *, n_components: int = 2):
    """PCA of a list of parameter pytrees (training checkpoints).

    Returns (coords [n_ckpt, n_components], explained_ratio,
    components [n_components, dim])."""
    X = np.stack([_flatten(p) for p in param_history])
    X = X - X[-1]  # center on the final point (reference convention)
    U, S, Vt = np.linalg.svd(X, full_matrices=False)
    coords = U[:, :n_components] * S[:n_components]
    var = S ** 2
    explained = var[:n_components] / (var.sum() + 1e-30)
    return coords, explained, Vt[:n_components]
