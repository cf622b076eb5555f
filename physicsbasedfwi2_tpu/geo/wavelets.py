"""Source wavelets.

Replaces ``deepwave.wavelets.ricker`` used by the reference at
/root/reference/models/networks.py:5357 (peak frequency f, length nt,
sample dt, peak time shift 1/f).
"""

from __future__ import annotations

import jax.numpy as jnp


def ricker(freq: float, nt: int, dt: float, peak_time: float | None = None,
           dtype=jnp.float32) -> jnp.ndarray:
    """Ricker (Mexican-hat) wavelet.

    Args:
        freq: peak frequency in Hz.
        nt: number of samples.
        dt: sample interval in seconds.
        peak_time: time of the wavelet peak in seconds; defaults to
            1/freq (the reference's convention, networks.py:5357).

    Returns:
        [nt] array.
    """
    if peak_time is None:
        peak_time = 1.0 / freq
    t = jnp.arange(nt, dtype=jnp.float64) * dt - peak_time
    a = (jnp.pi * freq * t) ** 2
    w = (1.0 - 2.0 * a) * jnp.exp(-a)
    return w.astype(dtype)


def spike_band(fc_low: float, fc_high: float, nt: int, dt: float,
               dtype=jnp.float32) -> jnp.ndarray:
    """Band-limited spike source.

    Equivalent in role to DENISE's ``FC_SPIKE_1/FC_SPIKE_2`` bandpass
    spike wavelet (reference networks.py:7711-7713): a delta filtered
    to [fc_low, fc_high] with a zero-phase trapezoidal band in the
    frequency domain.
    """
    freqs = jnp.fft.rfftfreq(nt, dt)
    # Cosine-tapered band edges (half-octave rolloff).
    lo_edge = jnp.clip((freqs - 0.5 * fc_low) / (0.5 * fc_low + 1e-20), 0, 1)
    hi_edge = jnp.clip((fc_high * 1.25 - freqs) / (0.25 * fc_high + 1e-20), 0, 1)
    taper = 0.5 * (1 - jnp.cos(jnp.pi * lo_edge)) * 0.5 * (1 - jnp.cos(jnp.pi * hi_edge))
    spec = taper.astype(jnp.complex64)
    # time shift so the wavelet onset is causal-ish
    delay = 1.2 / max(fc_low, 1e-6)
    spec = spec * jnp.exp(-2j * jnp.pi * freqs * delay)
    w = jnp.fft.irfft(spec, n=nt)
    peak = jnp.max(jnp.abs(w)) + 1e-20
    return (w / peak).astype(dtype)
