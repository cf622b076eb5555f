"""Data-misfit functions and the reference's seismogram-processing
pipeline as pure functions.

Replicates (reference networks.py:5396-5493): direct-wave removal by
subtracting a constant-model simulation, per-trace max normalization,
L1 misfit — plus L2/Huber and the frequency-continuation low-pass.
"""

from __future__ import annotations

import jax.numpy as jnp

from physicsbasedfwi2_tpu.geo.filters import lowpass_filter_time


def trace_normalize(d: jnp.ndarray, *, time_axis: int = 1,
                    eps: float = 1e-10) -> jnp.ndarray:
    """Divide each trace by its max |amplitude| over time.

    Matches ``rcv_amps / (abs(rcv_amps).max(dim=0) + 1e-10)``
    (networks.py:5418-5419, 5468-5470); our layout is
    [shots, nt, receivers] so the reduction runs over ``time_axis``.
    """
    m = jnp.max(jnp.abs(d), axis=time_axis, keepdims=True)
    return d / (m + eps)


def l1_misfit(pred: jnp.ndarray, obs: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - obs))


def l2_misfit(pred: jnp.ndarray, obs: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - obs) ** 2)


def huber_misfit(pred: jnp.ndarray, obs: jnp.ndarray,
                 delta: float = 1.0) -> jnp.ndarray:
    r = pred - obs
    a = jnp.abs(r)
    return jnp.mean(jnp.where(a <= delta, 0.5 * r * r,
                              delta * (a - 0.5 * delta)))


def normalized_trace_misfit(pred, obs_norm, direct=None, *, kind: str = "l1",
                            fc: float | None = None, dt: float | None = None):
    """The reference's full data-loss pipeline.

    pred/obs layout [shots, nt, receivers].

    Steps (networks.py:5467-5476): subtract ``direct`` (constant-model
    direct-arrival simulation) from pred, trace-normalize, optional
    low-pass for frequency continuation, then L1/L2/Huber against the
    already-normalized observations ``obs_norm``.
    """
    if direct is not None:
        pred = pred - direct
    pred = trace_normalize(pred)
    if fc is not None and fc > 0:
        assert dt is not None
        pred = lowpass_filter_time(pred, fc, dt, axis=1)
        obs_norm = lowpass_filter_time(obs_norm, fc, dt, axis=1)
    if kind == "l1":
        return l1_misfit(pred, obs_norm)
    if kind == "l2":
        return l2_misfit(pred, obs_norm)
    if kind == "huber":
        return huber_misfit(pred, obs_norm)
    raise ValueError(f"unknown misfit kind {kind!r}")
