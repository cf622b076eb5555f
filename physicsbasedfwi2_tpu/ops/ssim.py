"""SSIM metric/loss (JAX).

Replaces the reference's ``pytorch_ssim`` package
(/root/reference/pytorch_ssim/__init__.py:1-73): Gaussian-window
SSIM over NHWC images, differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gaussian_window(size: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def _filter2d(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 2D conv, NHWC, SAME padding."""
    c = img.shape[-1]
    k = kernel[:, :, None, None]
    k = jnp.tile(k, (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        img, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


def ssim(x: jnp.ndarray, y: jnp.ndarray, *, window_size: int = 11,
         sigma: float = 1.5, dynamic_range: float | None = None,
         reduce: bool = True) -> jnp.ndarray:
    """Structural similarity of two NHWC batches (higher is better).

    ``window_size=5`` reproduces the reference's SSIM loss config
    (pix2pix2SSIM_model.py:76-81).
    """
    if x.ndim == 2:
        x = x[None, :, :, None]
        y = y[None, :, :, None]
    if dynamic_range is None:
        dynamic_range = jnp.maximum(
            jnp.max(x) - jnp.min(x), jnp.max(y) - jnp.min(y)) + 1e-12
    c1 = (0.01 * dynamic_range) ** 2
    c2 = (0.03 * dynamic_range) ** 2
    w = _gaussian_window(window_size, sigma)
    mu_x = _filter2d(x, w)
    mu_y = _filter2d(y, w)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sig_x = _filter2d(x * x, w) - mu_x2
    sig_y = _filter2d(y * y, w) - mu_y2
    sig_xy = _filter2d(x * y, w) - mu_xy
    s = ((2 * mu_xy + c1) * (2 * sig_xy + c2)) / (
        (mu_x2 + mu_y2 + c1) * (sig_x + sig_y + c2))
    return jnp.mean(s) if reduce else s
