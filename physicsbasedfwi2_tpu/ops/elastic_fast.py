"""Fast-path elastic propagator: unsplit fields + Kosloff sponge.

Replaces DENISE for the inversion inner loop (the reference's
``d.grad`` call, networks.py:7787) when maximum throughput matters:
the split-field PML scheme in :mod:`ops.elastic` carries 10 state
fields; this scheme carries 5 (vx, vz, sxx, szz, sxz) with a
multiplicative sponge decay — half the state updates, half the
checkpoint memory for backprop-through-time, so both the forward and
the autodiff gradient are substantially cheaper.  Absorption is a
sponge, not PML: edge reflections are slightly stronger, which is
irrelevant for inversion as long as observed and predicted data come
from the SAME operator (the engines guarantee that for synthetic
workloads).

Physics: Virieux P-SV velocity-stress staggered grid, identical
staggering and medium averaging to ops/elastic.py (free surface via
szz row-0 zeroing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from physicsbasedfwi2_tpu.ops import pml
from physicsbasedfwi2_tpu.ops.elastic import (
    ElasticConfig, _pad, _staggered_medium,
)
from physicsbasedfwi2_tpu.ops.stencil import dx_fwd, dx_bwd, dz_fwd, dz_bwd
from physicsbasedfwi2_tpu.ops.scan_utils import chunked_checkpoint_scan


def _sponge(cfg: ElasticConfig):
    g = cfg.grid
    nz, nx = g.padded_shape
    top = 0 if g.free_surface else g.pml_width
    w = g.pml_width
    # scaled-down sigma (sponges over-reflect if as strong as PML)
    sx = pml.sigma_profile(nx, w, w, g.dx, cfg.vmax_pml) * 0.5
    sz = pml.sigma_profile(nz, top, w, g.dx, cfg.vmax_pml) * 0.5
    return jnp.exp(-(sz[:, None] + sx[None, :]) * g.dt)


def _virieux_step(med, damp, free_surface, src_z, src_x,
                  cfg: ElasticConfig):
    """Build the single Virieux P-SV velocity-stress time step.

    Shared by the inversion propagator (:func:`_single_shot_fast`)
    and the EPRECOND illumination map (:func:`elastic_illumination`)
    so the preconditioner is guaranteed to use the SAME operator as
    the gradient it divides: any change to the staggering, sponge or
    free-surface treatment propagates to both."""
    g = cfg.grid
    dt, inv_dx, order = g.dt, 1.0 / g.dx, cfg.order
    lam, mu, mu_xz, bx, bz = med
    lam2mu = lam + 2.0 * mu
    src_gain = dt * inv_dx * inv_dx * lam2mu[src_z, src_x]

    def step(fields, amp_t):
        vx, vz, sxx, szz, sxz = fields
        vx = damp * (vx + dt * bx * (dx_fwd(sxx, inv_dx, order)
                                     + dz_bwd(sxz, inv_dx, order)))
        vz = damp * (vz + dt * bz * (dx_bwd(sxz, inv_dx, order)
                                     + dz_fwd(szz, inv_dx, order)))
        dvxdx = dx_bwd(vx, inv_dx, order)
        dvzdz = dz_bwd(vz, inv_dx, order)
        sxx = damp * (sxx + dt * (lam2mu * dvxdx + lam * dvzdz))
        szz = damp * (szz + dt * (lam * dvxdx + lam2mu * dvzdz))
        sxz = damp * (sxz + dt * mu_xz * (dx_fwd(vz, inv_dx, order)
                                          + dz_fwd(vx, inv_dx, order)))
        amp = amp_t * src_gain
        sxx = sxx.at[src_z, src_x].add(amp)
        szz = szz.at[src_z, src_x].add(amp)
        if free_surface:
            szz = szz.at[0, :].set(0.0)
        return (vx, vz, sxx, szz, sxz)

    return step


def _single_shot_fast(med, damp, free_surface, wavelet, src_z, src_x,
                      rcv_z, rcv_x, cfg: ElasticConfig):
    nz, nx = med[0].shape
    zeros = jnp.zeros((nz, nx), jnp.float32)
    vstep = _virieux_step(med, damp, free_surface, src_z, src_x, cfg)

    def step(carry, amp_t):
        fields = vstep(carry, amp_t)
        vx, vz = fields[0], fields[1]
        return fields, (vx[rcv_z, rcv_x], vz[rcv_z, rcv_x])

    carry = tuple(zeros for _ in range(5))
    _, (rvx, rvz) = chunked_checkpoint_scan(step, carry, wavelet,
                                            chunk=cfg.chunk)
    return rvx, rvz


def elastic_illumination(vp, vs, rho, wavelet, src_z, src_x,
                         cfg: ElasticConfig):
    """Source-side illumination map: sum over shots and time of the
    forward particle-velocity energy vx^2 + vz^2, on the INTERIOR
    grid [nz, nx].

    DENISE's EPRECOND=1 Hessian-diagonal approximation (the reference
    ran DENISE with its gradient preconditioning available;
    SURVEY.md §2.1 N2): dividing the adjoint gradient by this map
    compensates geometric spreading so poorly-illuminated deep/far
    cells receive commensurate updates — the physics-informed version
    of the engines' crude depth^2 weight.  Forward-only (no
    backprop), so it runs as a plain scan with no checkpointing and
    is meant to be computed ONCE per inversion from the starting
    model (the map varies slowly with the model)."""
    g = cfg.grid
    vp = _pad(jax.lax.stop_gradient(vp).astype(jnp.float32), g)
    vs = _pad(jax.lax.stop_gradient(vs).astype(jnp.float32), g)
    rho = _pad(jax.lax.stop_gradient(rho).astype(jnp.float32), g)
    med = _staggered_medium(vp, vs, rho)
    damp = _sponge(cfg)
    top, w = g.top_pad, g.pml_width
    src_z = src_z + top
    src_x = src_x + w
    if wavelet.ndim == 1:
        wavelet = jnp.broadcast_to(wavelet[None, :],
                                   (src_z.shape[0],) + wavelet.shape)
    nz, nx = med[0].shape
    zeros = jnp.zeros((nz, nx), jnp.float32)
    free_surface = g.free_surface

    def one_shot(wav, sz, sx):
        vstep = _virieux_step(med, damp, free_surface, sz, sx, cfg)

        def step(carry, amp_t):
            fields = vstep(carry[:5], amp_t)
            vx, vz = fields[0], fields[1]
            acc = carry[5] + vx * vx + vz * vz
            return fields + (acc,), None

        carry = tuple(zeros for _ in range(5)) + (zeros,)
        final_carry, _ = jax.lax.scan(step, carry, wav)
        return final_carry[-1]

    illum = jnp.sum(jax.vmap(one_shot)(wavelet, src_z, src_x), 0)
    nz_i, nx_i = g.shape
    return jax.lax.dynamic_slice(illum, (top, w), (nz_i, nx_i))


def simulate_elastic_fast(vp, vs, rho, wavelet, src_z, src_x, rcv_z,
                          rcv_x, cfg: ElasticConfig):
    """Same contract as :func:`ops.elastic.simulate_elastic`
    ((vx, vz) traces, [ns, nt, nr] each), on the 5-field sponge
    scheme."""
    g = cfg.grid
    vp = _pad(vp.astype(jnp.float32), g)
    vs = _pad(vs.astype(jnp.float32), g)
    rho = _pad(rho.astype(jnp.float32), g)
    med = _staggered_medium(vp, vs, rho)
    damp = _sponge(cfg)
    top, w = g.top_pad, g.pml_width
    src_z = src_z + top
    src_x = src_x + w
    rcv_z = rcv_z + top
    rcv_x = rcv_x + w
    if wavelet.ndim == 1:
        wavelet = jnp.broadcast_to(wavelet[None, :],
                                   (src_z.shape[0],) + wavelet.shape)
    shot_fn = functools.partial(_single_shot_fast, med, damp,
                                g.free_surface, cfg=cfg)
    return jax.vmap(shot_fn)(wavelet, src_z, src_x, rcv_z, rcv_x)
