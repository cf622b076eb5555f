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


def unflatten_like(vec: np.ndarray, params):
    """Inverse of :func:`_flatten`: reshape a flat vector into a
    pytree with ``params``' structure (net_plotter
    npvec_to_tensorlist role)."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    out, k = [], 0
    for l in leaves:
        n = int(np.prod(np.shape(l)))
        out.append(np.asarray(vec[k : k + n], np.float32)
                   .reshape(np.shape(l)))
        k += n
    if k != vec.size:
        raise ValueError(f"vector has {vec.size} entries, params "
                         f"need {k}")
    return jax.tree_util.tree_unflatten(treedef, out)


def load_checkpoint_series(ckpt_dir: str, params_template):
    """Load an epoch-tagged ``<epoch>_net_G.npz`` checkpoint series
    (EngineBase.save_networks layout) sorted by epoch — the
    model_files list of the reference's projection.py:setup_PCA_
    directions.  Returns (epoch_tags, [param pytrees])."""
    import glob
    import os
    import re

    files = []
    for p in glob.glob(os.path.join(ckpt_dir, "*_net_G.npz")):
        m = re.match(r"(\d+)_net_G\.npz$", os.path.basename(p))
        if m:
            files.append((int(m.group(1)), p))
    files.sort()
    if len(files) < 3:
        raise FileNotFoundError(
            f"{ckpt_dir}: need >=3 epoch-tagged *_net_G.npz "
            f"checkpoints for a trajectory, found {len(files)}")
    keystr = jax.tree_util.keystr
    series = []
    for _, path in files:
        with np.load(path) as z:
            flat = {k: z[k] for k in z.files}
        series.append(jax.tree_util.tree_map_with_path(
            lambda kp, leaf: np.asarray(flat[keystr(kp)], np.float32),
            params_template))
    return [e for e, _ in files], series


def project_trajectory(series, components):
    """Project each checkpoint (relative to the final one) onto the
    PCA ``components`` [n_comp, dim] — the reference's
    projection.py:project_trajectory (cosine-similarity variant
    omitted; exact least-squares projection onto orthonormal PCA
    directions is the ``proj_method='lstsq'`` path)."""
    X = np.stack([_flatten(p) for p in series]) - _flatten(series[-1])
    return X @ np.asarray(components).T
