"""Filter-normalized loss surfaces.

Reference: loss_landscape/net_plotter.py (get_weights/set_weights/
setup_direction — filter-wise normalized random directions) and
plot_surface2.py:156-229 (``crunch2``: rank-partitioned (x, y) grid,
each point evaluating the full physics data-misfit).  Here the grid
sweep is a jit-batched vmap (:func:`loss_surface_2d`, single chip) or
a shard_map over the mesh (:func:`loss_surface_2d_sharded`,
multi-chip), replacing mpi4py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def filter_normalized_direction(params, key, *, norm: str = "filter"):
    """Random direction with per-filter norm matched to the weights
    (net_plotter.py 'filter' normalization): for each conv kernel
    [kh, kw, cin, cout], each output filter of d is rescaled to the
    norm of the corresponding weight filter."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    out = []
    for w, k in zip(leaves, keys):
        d = jax.random.normal(k, w.shape, jnp.float32)
        w32 = w.astype(jnp.float32)
        if norm == "filter" and w.ndim >= 2:
            axes = tuple(range(w.ndim - 1))  # per output-channel
            wn = jnp.sqrt(jnp.sum(w32 ** 2, axis=axes, keepdims=True))
            dn = jnp.sqrt(jnp.sum(d ** 2, axis=axes, keepdims=True))
            d = d * wn / (dn + 1e-10)
        elif norm == "layer" or w.ndim < 2:
            d = d * jnp.linalg.norm(w32.ravel()) / (
                jnp.linalg.norm(d.ravel()) + 1e-10)
        out.append(d.astype(w.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


def perturb_params(params, d1, d2, x: float, y: float):
    """w + x*d1 + y*d2 (net_plotter set_weights role)."""
    return jax.tree_util.tree_map(
        lambda w, a, b: w + x * a + y * b, params, d1, d2)


def loss_surface_2d(loss_fn, params, *, key=None, d1=None, d2=None,
                    xs=None, ys=None, norm: str = "filter",
                    batch: int = 8, data=None):
    """Evaluate loss_fn(params + x d1 + y d2) over a grid.

    Args:
        loss_fn: params -> scalar (typically the physics data misfit,
            the reference's evaluation.eval_loss3 role).  When
            ``data`` is given, called as loss_fn(params, data).
        xs, ys: 1D coordinate arrays (default 21 points in [-1, 1]).
        batch: how many grid points to vmap together.
        data: optional pytree of LARGE arrays (observed gathers, net
            inputs) threaded into the jit as an argument — closures
            would serialize them into the HLO as literal constants
            (see CLAUDE.md).

    Returns:
        (losses [len(ys), len(xs)], d1, d2)
    """
    if xs is None:
        xs = np.linspace(-1, 1, 21)
    if ys is None:
        ys = np.linspace(-1, 1, 21)
    if d1 is None or d2 is None:
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        d1 = filter_normalized_direction(params, k1, norm=norm)
        d2 = filter_normalized_direction(params, k2, norm=norm)

    gx, gy = np.meshgrid(xs, ys)
    coords = jnp.asarray(
        np.stack([gx.ravel(), gy.ravel()], 1), jnp.float32)

    @jax.jit
    def eval_batch(cb, data):
        def one(c):
            p = perturb_params(params, d1, d2, c[0], c[1])
            return loss_fn(p) if data is None else loss_fn(p, data)
        return jax.vmap(one)(cb)

    n = coords.shape[0]
    pad = (-n) % batch
    coords_p = jnp.pad(coords, ((0, pad), (0, 0)))
    losses = []
    for s in range(0, n + pad, batch):
        losses.append(np.asarray(eval_batch(coords_p[s : s + batch],
                                            data)))
    flat = np.concatenate(losses)[:n]
    return flat.reshape(len(ys), len(xs)), d1, d2


def loss_surface_2d_sharded(loss_fn, params, mesh, *, key=None,
                            d1=None, d2=None, xs=None, ys=None,
                            norm: str = "filter", axis: str = "shot",
                            data=None):
    """Multi-chip grid sweep: grid points sharded over the mesh, each
    device evaluating its slice — the mpi4py rank-partitioned crunch2
    (plot_surface2.py:156-229 + scheduler.get_job_indices) as one
    shard_map with an all_gather, no MPI."""
    import functools
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    if xs is None:
        xs = np.linspace(-1, 1, 21)
    if ys is None:
        ys = np.linspace(-1, 1, 21)
    if d1 is None or d2 is None:
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        d1 = filter_normalized_direction(params, k1, norm=norm)
        d2 = filter_normalized_direction(params, k2, norm=norm)

    gx, gy = np.meshgrid(xs, ys)
    coords = np.stack([gx.ravel(), gy.ravel()], 1).astype(np.float32)
    n = coords.shape[0]
    ndev = mesh.shape[axis]
    pad = (-n) % ndev
    coords_p = jnp.asarray(np.pad(coords, ((0, pad), (0, 0))))

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P(axis), P()), out_specs=P(),
        check_vma=False)
    def sweep(cb, data):
        def one(c):
            p = perturb_params(params, d1, d2, c[0], c[1])
            return loss_fn(p) if data is None else loss_fn(p, data)
        local = jax.lax.map(one, cb)
        return jax.lax.all_gather(local, axis, tiled=True)

    flat = np.asarray(sweep(coords_p, data))[:n]
    return flat.reshape(len(ys), len(xs)), d1, d2
