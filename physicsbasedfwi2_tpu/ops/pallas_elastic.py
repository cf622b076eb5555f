"""Pallas TPU forward kernel for the P-SV elastic propagator
(experimental — measured SLOWER than the XLA path; kept as the
documented starting point for a future fused elastic kernel).

Measured on the DENISE workload (5 shots x nt=3334 x 100x300, v5e):
139 ms vs 109 ms for the XLA scan path.  Unlike the acoustic case
(4 fields, 8 rolls/step -> 4x speedup in VMEM), the elastic stencil
needs 8 staggered derivatives = 24 rolls/step, and `pltpu.roll` cost
dominates — VMEM residency doesn't pay.  A future version should
replace rolls with shifted static slices on a (halo-padded) block or
restructure to fewer derivative applications.  Physics verified:
receiver traces match the XLA path to corr 0.9999977 with identical
arrival times (absorbing-top configs).

The gradient path stays on the XLA autodiff scheme in
:mod:`physicsbasedfwi2_tpu.ops.elastic` either way.

Design: unsplit velocity–stress fields (vx, vz, sxx, szz, sxz) with a
Kosloff sponge absorber (multiplicative decay per step) instead of the
XLA path's split-field PML — 5 VMEM-resident fields instead of 10,
the whole time loop on-chip, one grid program per shot.  Both
receiver components (vx, vz rows) are recorded per step.

Staggering matches ops/elastic.py (Virieux): sxx/szz at (i, j),
sxz at (i+1/2, j+1/2), vx at (i, j+1/2), vz at (i+1/2, j).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from physicsbasedfwi2_tpu.ops import pml
from physicsbasedfwi2_tpu.ops.elastic import ElasticConfig, _pad, _staggered_medium
from physicsbasedfwi2_tpu.ops.pallas_kernels import (
    _round_up, _dx_fwd, _dx_bwd, _dz_fwd, _dz_bwd,
)


def _prepare_el(vp, vs, rho, cfg: ElasticConfig):
    g = cfg.grid
    vp_p = _pad(vp.astype(jnp.float32), g)
    vs_p = _pad(vs.astype(jnp.float32), g)
    rho_p = _pad(rho.astype(jnp.float32), g)
    lam, mu, mu_xz, bx, bz = _staggered_medium(vp_p, vs_p, rho_p)
    nzp, nxp = vp_p.shape
    nz8 = _round_up(nzp, 8)
    nx128 = _round_up(nxp, 128)

    def padp(a):
        return jnp.pad(a, ((0, nz8 - nzp), (0, nx128 - nxp)), mode="edge")

    # sponge: sum of axis profiles, as a per-step decay factor
    top = 0 if g.free_surface else g.pml_width
    w = g.pml_width
    sx = pml.sigma_profile(nxp, w, w, g.dx, cfg.vmax_pml) * 0.5
    sz = pml.sigma_profile(nzp, top, w, g.dx, cfg.vmax_pml) * 0.5
    sig = sz[:, None] + sx[None, :]
    damp = jnp.exp(-sig * g.dt)
    rows = np.zeros((nz8, 1), np.float32)
    rows[2 : nzp - 2] = 1.0
    cols = np.zeros((1, nx128), np.float32)
    cols[0, 2 : nxp - 2] = 1.0
    ring = jnp.asarray(rows * cols)
    damp = padp(damp) * ring
    lam2mu = lam + 2.0 * mu
    meds = tuple(padp(m) for m in
                 (lam, lam2mu, mu_xz, bx, bz))
    return meds, damp, (nz8, nx128), nzp


def _el_kernel(src_z, src_x, rcv_row, wav_sm,
               lam_ref, l2m_ref, muxz_ref, bx_ref, bz_ref, damp_ref,
               hx_ref, hz_ref, vx, vz, sxx, szz, sxz,
               *, nt: int, nxp: int, dt: float, inv_dx: float,
               free_surface: bool):
    shot = pl.program_id(0)
    sz_i = src_z[shot]
    sx_i = src_x[shot]
    rrow = rcv_row[shot]
    for r in (vx, vz, sxx, szz, sxz):
        r[:] = jnp.zeros_like(r)
    lam = lam_ref[:]
    l2m = l2m_ref[:]
    muxz = muxz_ref[:]
    bx = bx_ref[:]
    bz = bz_ref[:]
    damp = damp_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, nxp), 1)
    src_onehot = (col == sx_i).astype(jnp.float32)
    l2m_src = jnp.sum(l2m_ref[pl.ds(sz_i, 1), :] * src_onehot)
    src_gain = dt * inv_dx * inv_dx * l2m_src
    fs_mask = None
    if free_surface:
        row0 = jax.lax.broadcasted_iota(jnp.int32, (vx.shape[0], 1), 0)
        fs_mask = (row0 != 0).astype(jnp.float32)  # zero row 0

    dtx = dt * inv_dx

    def body(t, _):
        # velocity updates read the current (old) stresses directly;
        # stress updates below each read only their own old value, so
        # no snapshots are needed
        vx[:] = damp * (vx[:] + dtx * bx * (
            _dx_fwd(sxx[:]) + _dz_bwd(sxz[:])))
        vz[:] = damp * (vz[:] + dtx * bz * (
            _dx_bwd(sxz[:]) + _dz_fwd(szz[:])))
        dvxdx = _dx_bwd(vx[:])
        dvzdz = _dz_bwd(vz[:])
        sxx[:] = damp * (sxx[:] + dtx * (l2m * dvxdx + lam * dvzdz))
        new_szz = damp * (szz[:] + dtx * (lam * dvxdx + l2m * dvzdz))
        new_sxz = damp * (sxz[:] + dtx * muxz * (
            _dx_fwd(vz[:]) + _dz_fwd(vx[:])))
        if free_surface:
            new_szz = new_szz * fs_mask
        szz[:] = new_szz
        sxz[:] = new_sxz
        amp = wav_sm[shot, t] * src_gain
        sxx[pl.ds(sz_i, 1), :] = (sxx[pl.ds(sz_i, 1), :]
                                  + amp * src_onehot)
        szz[pl.ds(sz_i, 1), :] = (szz[pl.ds(sz_i, 1), :]
                                  + amp * src_onehot)
        hx_ref[0, pl.ds(t, 1), :] = vx[pl.ds(rrow, 1), :]
        hz_ref[0, pl.ds(t, 1), :] = vz[pl.ds(rrow, 1), :]
        return 0

    jax.lax.fori_loop(0, nt, body, 0)


def elastic_forward_pallas(vp, vs, rho, wavelet, src_z, src_x, rcv_z,
                           rcv_x, cfg: ElasticConfig):
    """Pallas forward elastic simulation; same contract as
    :func:`simulate_elastic` (returns (vx, vz) traces).

    Uses a Kosloff sponge instead of split-field PML, so amplitudes
    near the edges differ slightly from the XLA path; interior
    kinematics match.  Receivers of a shot must share one grid row.
    """
    g = cfg.grid
    if g.free_surface:
        # the zero ring needed for circular rolls clamps the top two
        # rows, which is a rigid (not free) surface — wrong surface
        # waves. Free-surface workloads use the XLA path.
        raise NotImplementedError(
            "pallas elastic kernel supports absorbing tops only; "
            "use ops.simulate_elastic for free-surface workloads")
    ns = int(src_z.shape[0])
    nt = g.nt
    meds, damp, (nz8, nx128), nzp = _prepare_el(vp, vs, rho, cfg)
    top, w = g.top_pad, g.pml_width
    if wavelet.ndim == 1:
        wavelet = jnp.broadcast_to(wavelet[None, :], (ns, nt))
    wavelet = wavelet.astype(jnp.float32)
    src_z_p = (src_z + top).astype(jnp.int32)
    src_x_p = (src_x + w).astype(jnp.int32)
    rcv_row = (rcv_z[:, 0] + top).astype(jnp.int32)

    kern = functools.partial(_el_kernel, nt=nt, nxp=nx128, dt=g.dt,
                             inv_dx=1.0 / g.dx,
                             free_surface=g.free_surface)
    spec = pl.BlockSpec((nz8, nx128), lambda i, *_: (0, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ns,),
        in_specs=[spec] * 6,
        out_specs=(
            pl.BlockSpec((1, nt, nx128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nt, nx128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((nz8, nx128), jnp.float32)
                        for _ in range(5)],
    )
    hx, hz = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((ns, nt, nx128), jnp.float32),
            jax.ShapeDtypeStruct((ns, nt, nx128), jnp.float32),
        ),
    )(src_z_p, src_x_p, rcv_row, wavelet, *meds, damp)
    cols = (rcv_x + w).astype(jnp.int32)
    rvx = jnp.take_along_axis(hx, cols[:, None, :], axis=2)
    rvz = jnp.take_along_axis(hz, cols[:, None, :], axis=2)
    return rvx, rvz
