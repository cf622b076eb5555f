"""Hessian spectra via Hessian-vector products.

Reference: loss_landscape/hess_vec_prod.py:1-150 +
plot_hessian_eigen.py (scipy LOBPCG/eigsh over torch HVPs).  Here
HVPs are exact `jvp`-of-`grad` compositions and extreme eigenvalues
come from a jittable Lanczos iteration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def hvp(loss_fn, params, v):
    """Exact Hessian-vector product via forward-over-reverse."""
    return jax.jvp(jax.grad(loss_fn), (params,), (v,))[1]


def _tree_dot(a, b):
    return sum(jnp.vdot(x, y) for x, y in
               zip(jax.tree_util.tree_leaves(a),
                   jax.tree_util.tree_leaves(b)))


def _tree_axpy(alpha, x, y):
    return jax.tree_util.tree_map(lambda a, b: alpha * a + b, x, y)


def _tree_scale(alpha, x):
    return jax.tree_util.tree_map(lambda a: alpha * a, x)


def lanczos_extreme_eigs(loss_fn, params, *, steps: int = 20,
                         key=None, data=None):
    """Estimate extreme Hessian eigenvalues with ``steps`` Lanczos
    iterations (full reorthogonalization; fine for steps <= ~50).

    ``data``: optional pytree of large arrays, passed into the HVP
    jit as an argument (loss_fn then takes (params, data)) instead of
    being serialized into the HLO as closure constants.

    Returns (eig_min, eig_max, ritz_values)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    v = jax.tree_util.tree_unflatten(
        treedef, [jax.random.normal(k, l.shape, jnp.float32)
                  for k, l in zip(keys, leaves)])
    nrm = jnp.sqrt(_tree_dot(v, v).real)
    v = _tree_scale(1.0 / nrm, v)

    if data is None:
        hvp_fn = jax.jit(lambda p, w: hvp(loss_fn, p, w))
    else:
        hvp_jit = jax.jit(
            lambda p, w, d: hvp(lambda q: loss_fn(q, d), p, w))
        hvp_fn = lambda p, w: hvp_jit(p, w, data)
    vs = [v]
    alphas, betas = [], []
    w_prev = None
    for j in range(steps):
        w = hvp_fn(params, vs[-1])
        alpha = _tree_dot(w, vs[-1]).real
        w = _tree_axpy(-alpha, vs[-1], w)
        if j > 0:
            w = _tree_axpy(-betas[-1], vs[-2], w)
        # full reorthogonalization
        for u in vs:
            c = _tree_dot(w, u).real
            w = _tree_axpy(-c, u, w)
        beta = jnp.sqrt(_tree_dot(w, w).real)
        alphas.append(float(alpha))
        if j < steps - 1:
            if float(beta) < 1e-10:
                break
            betas.append(float(beta))
            vs.append(_tree_scale(1.0 / beta, w))

    k = len(alphas)
    T = np.zeros((k, k))
    for i, a in enumerate(alphas):
        T[i, i] = a
    for i, b in enumerate(betas[: k - 1]):
        T[i, i + 1] = T[i + 1, i] = b
    ritz = np.linalg.eigvalsh(T)
    return float(ritz.min()), float(ritz.max()), ritz
