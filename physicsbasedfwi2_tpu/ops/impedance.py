"""Impedance-domain convolutional modeling.

Capability-equivalent of the reference's Auto2 impedance path
(Auto2_model.py:240-278): acoustic impedance Zp = vp*rho ->
normal-incidence reflectivity r = (Zp2 - Zp1)/(Zp2 + Zp1) -> synthetic
seismogram by convolving each trace with a Ricker wavelet (the
reference uses a bruges wavelet + torch conv1d), compared with L1.
Also serves the Zp-parameterized elastic workload (AutoElMarZp22,
networks.py:10579) via the impedance<->velocity conversions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from physicsbasedfwi2_tpu.geo.wavelets import ricker


def impedance(vp: jnp.ndarray, rho: jnp.ndarray | None = None) -> jnp.ndarray:
    """Acoustic impedance; Gardner density if rho not given."""
    if rho is None:
        rho = 310.0 * vp ** 0.25
    return vp * rho


def reflectivity(zp: jnp.ndarray, *, axis: int = -2) -> jnp.ndarray:
    """Normal-incidence reflectivity along depth
    (Auto2_model.py: (zp2-zp1)/(zp2+zp1)); output has the same length
    with a zero appended at the bottom."""
    zp = jnp.moveaxis(zp, axis, 0)
    z1, z2 = zp[:-1], zp[1:]
    r = (z2 - z1) / (z2 + z1 + 1e-12)
    r = jnp.concatenate([r, jnp.zeros_like(r[:1])], axis=0)
    return jnp.moveaxis(r, 0, axis)


def convolve_wavelet(refl: jnp.ndarray, wavelet: jnp.ndarray, *,
                     axis: int = -2) -> jnp.ndarray:
    """Depth-domain convolutional synthetic: conv1d of each trace with
    the (zero-phase-centred) wavelet."""
    r = jnp.moveaxis(refl, axis, -1)
    shape = r.shape
    flat = r.reshape(-1, shape[-1])[:, None, :]  # [B, C=1, W]
    k = wavelet[None, None, ::-1]
    out = jax.lax.conv_general_dilated(
        flat, k, window_strides=(1,),
        padding=[(wavelet.shape[0] // 2,
                  wavelet.shape[0] - 1 - wavelet.shape[0] // 2)],
        dimension_numbers=("NCH", "OIH", "NCH"))
    out = out[:, 0, :].reshape(shape)
    return jnp.moveaxis(out, -1, axis)


def impedance_synthetic(vp: jnp.ndarray, *, freq: float = 30.0,
                        n_wavelet: int = 64, dt: float = 0.002,
                        rho: jnp.ndarray | None = None,
                        axis: int = -2) -> jnp.ndarray:
    """vp (+rho) -> impedance -> reflectivity -> wavelet synthetic —
    the full Auto2 impedance forward model as one pure function."""
    wav = ricker(freq, n_wavelet, dt, peak_time=n_wavelet * dt / 2)
    return convolve_wavelet(reflectivity(impedance(vp, rho), axis=axis),
                            wav, axis=axis)


def impedance_misfit(vp_pred, vp_true, *, kind: str = "l1", **kw):
    """L1 misfit between impedance synthetics (Auto2 loss path)."""
    s_pred = impedance_synthetic(vp_pred, **kw)
    s_true = impedance_synthetic(vp_true, **kw)
    if kind == "l1":
        return jnp.mean(jnp.abs(s_pred - s_true))
    return jnp.mean((s_pred - s_true) ** 2)
