"""PML absorbing-boundary damping profiles.

Split-field PML for first-order wave systems: each split field is
damped along its own axis with a polynomial sigma profile.  Replaces
the PML inside deepwave's scalar propagator (reference
networks.py:5408ff black box) and DENISE's CPML (networks.py N2).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def sigma_profile(n: int, width_lo: int, width_hi: int, dx: float,
                  vmax: float, *, power: int = 2, refl: float = 1e-4,
                  half_cell: bool = False) -> jnp.ndarray:
    """1D PML damping profile sigma(x) >= 0 of length ``n``.

    sigma rises polynomially from 0 at the interior edge to
    sigma_max = -(p+1) * vmax * ln(R) / (2 * L) at the outer edge.

    Args:
        width_lo / width_hi: PML thickness (cells) at the low/high end
            (0 disables that side, e.g. a free surface).
        half_cell: evaluate at staggered positions (i + 1/2).
    """
    x = jnp.arange(n, dtype=jnp.float32)
    if half_cell:
        x = x + 0.5
    sigma = jnp.zeros(n, jnp.float32)
    if width_lo > 0:
        L = width_lo * dx
        smax = -(power + 1) * vmax * math.log(refl) / (2.0 * L)
        d = jnp.clip((width_lo - x) * dx, 0.0, L)
        sigma = sigma + smax * (d / L) ** power
    if width_hi > 0:
        L = width_hi * dx
        smax = -(power + 1) * vmax * math.log(refl) / (2.0 * L)
        d = jnp.clip((x - (n - 1 - width_hi)) * dx, 0.0, L)
        sigma = sigma + smax * (d / L) ** power
    return sigma


def damping_factors(sigma: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Per-step exponential decay factor exp(-sigma * dt)."""
    return jnp.exp(-sigma * dt)
