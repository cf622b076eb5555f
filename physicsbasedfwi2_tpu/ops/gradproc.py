"""Gradient post-processing for FWI model gradients.

The reference applies, after every adjoint call:
- depth^2 weighting ``ss = arange(nz)**2`` (networks.py:5329-5332, 5492)
- water mask ``grad[true == 1500] = 0`` (networks.py:5493) / top-row
  zeroing for DENISE (networks.py:7808-7814)
- per-field rescale ``r = max(field)/max(grad)`` (networks.py:7843-7862)
- horizontal taper near sources (DENISE SWS_TAPER_GRAD_HOR,
  networks.py:7731)

Here they are composable pure functions over [nz, nx] gradients.
"""

from __future__ import annotations

import jax.numpy as jnp


def depth_weighting(grad: jnp.ndarray, power: float = 2.0) -> jnp.ndarray:
    """Multiply each row by depth_index**power."""
    nz = grad.shape[-2]
    w = jnp.arange(nz, dtype=grad.dtype) ** power
    return grad * w[..., :, None]


def water_mask(grad: jnp.ndarray, reference_model: jnp.ndarray,
               water_vel: float = 1500.0) -> jnp.ndarray:
    """Zero the gradient wherever the true/initial model is water."""
    return jnp.where(reference_model == water_vel, 0.0, grad)


def taper_top(grad: jnp.ndarray, rows: int, *, smooth: int = 0) -> jnp.ndarray:
    """Zero (optionally cosine-ramp) the top ``rows`` rows —
    the DENISE seabed mask (networks.py:7808-7814, rows 0:25)."""
    nz = grad.shape[-2]
    z = jnp.arange(nz, dtype=grad.dtype)
    if smooth > 0:
        ramp = jnp.clip((z - rows) / smooth, 0.0, 1.0)
        w = 0.5 * (1 - jnp.cos(jnp.pi * ramp))
    else:
        w = (z >= rows).astype(grad.dtype)
    return grad * w[..., :, None]


def rescale_to_model(grad: jnp.ndarray, model: jnp.ndarray,
                     eps: float = 1e-20) -> jnp.ndarray:
    """Scale so max|grad| matches max|model| — DENISE's r1..r3 step
    (networks.py:7843-7862) that makes per-field step sizes
    comparable across Vp/Vs/Rho."""
    r = jnp.max(jnp.abs(model)) / (jnp.max(jnp.abs(grad)) + eps)
    return grad * r


def smooth_spatial(grad: jnp.ndarray, iters: int) -> jnp.ndarray:
    """Separable binomial [1/4, 1/2, 1/4] smoothing of the gradient,
    ``iters`` passes per axis (~Gaussian sigma = sqrt(iters/2) cells).

    The DENISE role model is its spatial gradient filtering
    (SPATFILTER / WD_DAMP preconditioners): the raw adjoint gradient
    carries near-singular values at the source/receiver cells (the
    adjoint wavefield is injected there) that otherwise dominate a
    max-normalized update.  Edge rows/cols use replicate ("edge")
    padding so boundary values are not attenuated."""
    for _ in range(iters):
        p = jnp.pad(grad, [(1, 1), (0, 0)], mode="edge")
        grad = 0.25 * p[:-2] + 0.5 * p[1:-1] + 0.25 * p[2:]
        p = jnp.pad(grad, [(0, 0), (1, 1)], mode="edge")
        grad = 0.25 * p[:, :-2] + 0.5 * p[:, 1:-1] + 0.25 * p[:, 2:]
    return grad
