"""Stochastic-gradient MCMC samplers as optax transforms.

Capability-equivalents of the reference's seisgan/optimizers.py:
``MALA`` (SGLD, lines 6-60) and ``SGHMC`` (62-120) — Bayesian
posterior sampling over latents/weights.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class SgldState(NamedTuple):
    key: jax.Array
    count: jnp.ndarray


def sgld(learning_rate: float, *, seed: int = 0,
         temperature: float = 1.0) -> optax.GradientTransformation:
    """Stochastic Gradient Langevin Dynamics:
    dp = -lr*g + N(0, sqrt(2*lr*T)) (ref seisgan/optimizers.py:6-60)."""

    def init(params):
        del params
        return SgldState(jax.random.PRNGKey(seed), jnp.zeros([], jnp.int32))

    def update(grads, state, params=None):
        del params
        key, sub = jax.random.split(state.key)
        leaves, treedef = jax.tree_util.tree_flatten(grads)
        keys = jax.random.split(sub, len(leaves))
        noise_scale = jnp.sqrt(2.0 * learning_rate * temperature)
        updates = [
            -learning_rate * g
            + noise_scale * jax.random.normal(k, g.shape, g.dtype)
            for g, k in zip(leaves, keys)
        ]
        return (jax.tree_util.tree_unflatten(treedef, updates),
                SgldState(key, state.count + 1))

    return optax.GradientTransformation(init, update)


class SghmcState(NamedTuple):
    key: jax.Array
    momentum: optax.Updates
    count: jnp.ndarray


def sghmc(learning_rate: float, *, friction: float = 0.05, seed: int = 0,
          temperature: float = 1.0) -> optax.GradientTransformation:
    """Stochastic Gradient Hamiltonian Monte Carlo
    (ref seisgan/optimizers.py:62-120):
    v <- (1-a)v - lr*g + N(0, sqrt(2*a*lr*T)); p <- p + v."""

    def init(params):
        return SghmcState(
            jax.random.PRNGKey(seed),
            jax.tree_util.tree_map(jnp.zeros_like, params),
            jnp.zeros([], jnp.int32))

    def update(grads, state, params=None):
        del params
        key, sub = jax.random.split(state.key)
        g_leaves, treedef = jax.tree_util.tree_flatten(grads)
        m_leaves = treedef.flatten_up_to(state.momentum)
        keys = jax.random.split(sub, len(g_leaves))
        noise_scale = jnp.sqrt(2.0 * friction * learning_rate * temperature)
        new_m = [
            (1.0 - friction) * m - learning_rate * g
            + noise_scale * jax.random.normal(k, g.shape, g.dtype)
            for g, m, k in zip(g_leaves, m_leaves, keys)
        ]
        momentum = jax.tree_util.tree_unflatten(treedef, new_m)
        return momentum, SghmcState(key, momentum, state.count + 1)

    return optax.GradientTransformation(init, update)
