"""Frequency-domain filtering for multiscale (frequency-continuation)
FWI.

DENISE applies per-stage low-pass corner frequencies (``fc_high`` in
``add_fwi_stage``, reference networks.py:7761) to both the source
wavelet and the observed data.  We implement a zero-phase Butterworth
low-pass applied along the time axis via rFFT — pure-functional and
jit-friendly (static nt).
"""

from __future__ import annotations

import jax.numpy as jnp


def butter_lowpass_coeffs(freqs: jnp.ndarray, fc: float, order: int = 6
                          ) -> jnp.ndarray:
    """|H(f)| of an order-n Butterworth low-pass (zero-phase => use
    the magnitude response directly)."""
    return 1.0 / jnp.sqrt(1.0 + (freqs / fc) ** (2 * order))


def lowpass_filter_time(x: jnp.ndarray, fc: float, dt: float, *,
                        axis: int = -1, order: int = 6) -> jnp.ndarray:
    """Zero-phase Butterworth low-pass along ``axis``.

    Args:
        x: data with a time axis of static length nt.
        fc: corner frequency in Hz. fc <= 0 disables filtering.
        dt: sample interval in seconds.
    """
    if fc is None or fc <= 0:
        return x
    nt = x.shape[axis]
    freqs = jnp.fft.rfftfreq(nt, dt)
    h = butter_lowpass_coeffs(freqs, fc, order).astype(x.dtype)
    spec = jnp.fft.rfft(x, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = h.shape[0]
    spec = spec * h.reshape(shape)
    return jnp.fft.irfft(spec, n=nt, axis=axis).astype(x.dtype)
