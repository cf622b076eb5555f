"""Pallas TPU fast path for the acoustic propagator.

The XLA `lax.scan` path round-trips all four wavefields through HBM
every time step (~26 MB/step for the Marmousi workload) and is
bandwidth-bound at ~0.26 s/forward.  This kernel keeps the entire
wavefield state in VMEM for the whole time loop (one grid program per
shot), eliminating HBM traffic: per step only one receiver row
(nxp floats) is written to the VMEM output block.

Numerics match :mod:`physicsbasedfwi2_tpu.ops.acoustic` (same
staggered scheme, split-field PML, source scaling); the outer 2-cell
ring of every field is pinned to zero so `pltpu.roll` wraparound
reads zeros — equivalent to the XLA path's zero padding.

Layout: fields are [nzp8, nxp128] f32 (padded to sublane/lane
multiples).  Receivers are assumed to lie on one grid row per shot
(true for every reference workload — surface/near-surface lines);
the kernel records the full row each step and the host gathers the
receiver columns afterwards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from physicsbasedfwi2_tpu.ops import pml
from physicsbasedfwi2_tpu.ops.acoustic import AcousticConfig, _damping, _pad_model

_C1 = 9.0 / 8.0
_C2 = -1.0 / 24.0


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _shift_x(f, k):
    """f shifted by +k cells along lanes; relies on zero ring.
    pltpu.roll requires a non-negative circular shift."""
    return pltpu.roll(f, (-k) % f.shape[1], 1)


def _shift_z(f, k):
    return pltpu.roll(f, (-k) % f.shape[0], 0)


def _dx_fwd(f):
    return _C1 * (_shift_x(f, 1) - f) + _C2 * (_shift_x(f, 2) - _shift_x(f, -1))


def _dx_bwd(f):
    return _C1 * (f - _shift_x(f, -1)) + _C2 * (_shift_x(f, 1) - _shift_x(f, -2))


def _dz_fwd(f):
    return _C1 * (_shift_z(f, 1) - f) + _C2 * (_shift_z(f, 2) - _shift_z(f, -1))


def _dz_bwd(f):
    return _C1 * (f - _shift_z(f, -1)) + _C2 * (_shift_z(f, 1) - _shift_z(f, -2))


def _forward_kernel(src_z, src_x, rcv_row, wav_ref, kappa_dt_ref, ax_v_ref,
                    az_v_ref, ax_p_ref, az_p_ref, ring_ref, hist_ref,
                    vx_ref, vz_ref, px_ref, pz_ref, *, nt: int, nxp: int,
                    dt: float, inv_dx: float):
    shot = pl.program_id(0)
    sz = src_z[shot]
    sx = src_x[shot]
    rrow = rcv_row[shot]

    vx_ref[:] = jnp.zeros_like(vx_ref)
    vz_ref[:] = jnp.zeros_like(vz_ref)
    px_ref[:] = jnp.zeros_like(px_ref)
    pz_ref[:] = jnp.zeros_like(pz_ref)

    kappa_dt = kappa_dt_ref[:]
    ax_v = ax_v_ref[:] * ring_ref[:]
    az_v = az_v_ref[:] * ring_ref[:]
    ax_p = ax_p_ref[:] * ring_ref[:]
    az_p = az_p_ref[:] * ring_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, nxp), 1)
    src_onehot = (col == sx).astype(jnp.float32)
    # source gain: kappa_dt at the source cell / dx^2
    src_kap = kappa_dt_ref[pl.ds(sz, 1), :]  # [1, nxp]
    src_gain = jnp.sum(src_kap * src_onehot) * (inv_dx * inv_dx)

    def body(t, _):
        p = px_ref[:] + pz_ref[:]
        vx_ref[:] = ax_v * (vx_ref[:] + (dt * inv_dx) * _dx_fwd(p))
        vz_ref[:] = az_v * (vz_ref[:] + (dt * inv_dx) * _dz_fwd(p))
        px_ref[:] = ax_p * (px_ref[:] + (kappa_dt * inv_dx) * _dx_bwd(vx_ref[:]))
        pz_ref[:] = az_p * (pz_ref[:] + (kappa_dt * inv_dx) * _dz_bwd(vz_ref[:]))
        amp = wav_ref[shot, t]
        cur = pz_ref[pl.ds(sz, 1), :]
        pz_ref[pl.ds(sz, 1), :] = cur + amp * src_gain * src_onehot
        hist_ref[0, pl.ds(t, 1), :] = (px_ref[pl.ds(rrow, 1), :]
                                       + pz_ref[pl.ds(rrow, 1), :])
        return 0

    jax.lax.fori_loop(0, nt, body, 0)


def _prepare(vp, cfg: AcousticConfig):
    """Pad model/profiles to TPU tile multiples; returns operands."""
    g = cfg.grid
    vp_pad = _pad_model(vp.astype(jnp.float32), g)
    nzp, nxp = vp_pad.shape
    nz8 = _round_up(nzp, 8)
    nx128 = _round_up(nxp, 128)
    kappa_dt = jnp.pad(vp_pad * vp_pad * g.dt,
                       ((0, nz8 - nzp), (0, nx128 - nxp)), mode="edge")
    ax_v, az_v, ax_p, az_p = _damping(cfg)

    def pad_x(a):  # [1, nxp] -> [1, nx128]
        return jnp.pad(a, ((0, 0), (0, nx128 - nxp)), mode="edge")

    def pad_z(a):  # [nzp, 1] -> [nz8, 1]
        return jnp.pad(a, ((0, nz8 - nzp), (0, 0)), mode="edge")

    ax_v2 = jnp.broadcast_to(pad_x(ax_v), (nz8, nx128))
    az_v2 = jnp.broadcast_to(pad_z(az_v), (nz8, nx128))
    ax_p2 = jnp.broadcast_to(pad_x(ax_p), (nz8, nx128))
    az_p2 = jnp.broadcast_to(pad_z(az_p), (nz8, nx128))
    # ring mask: zero outer 2 cells of the *original padded* domain
    # plus everything in the alignment pad
    rows = np.zeros((nz8, 1), np.float32)
    rows[2 : nzp - 2] = 1.0
    cols = np.zeros((1, nx128), np.float32)
    cols[0, 2 : nxp - 2] = 1.0
    ring = jnp.asarray(rows * cols)
    return kappa_dt, ax_v2, az_v2, ax_p2, az_p2, ring, (nz8, nx128)


def acoustic_forward_pallas(vp, wavelet, src_z, src_x, rcv_z, rcv_x,
                            cfg: AcousticConfig):
    """Pallas forward simulation; same contract as
    :func:`physicsbasedfwi2_tpu.ops.acoustic.simulate_acoustic`.

    Requires all receivers of a shot to share one grid row.
    """
    g = cfg.grid
    ns = int(src_z.shape[0])
    nt = g.nt
    kappa_dt, ax_v, az_v, ax_p, az_p, ring, (nz8, nx128) = _prepare(vp, cfg)
    top, w = g.top_pad, g.pml_width

    if wavelet.ndim == 1:
        wavelet = jnp.broadcast_to(wavelet[None, :], (ns, nt))
    wavelet = wavelet.astype(jnp.float32)

    src_z_p = (src_z + top).astype(jnp.int32)
    src_x_p = (src_x + w).astype(jnp.int32)
    rcv_row = (rcv_z[:, 0] + top).astype(jnp.int32)

    kern = functools.partial(_forward_kernel, nt=nt, nxp=nx128,
                             dt=g.dt, inv_dx=1.0 / g.dx)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ns,),
        in_specs=[
            pl.BlockSpec((nz8, nx128), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),  # kappa_dt
            pl.BlockSpec((nz8, nx128), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),  # ax_v
            pl.BlockSpec((nz8, nx128), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),  # az_v
            pl.BlockSpec((nz8, nx128), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),  # ax_p
            pl.BlockSpec((nz8, nx128), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),  # az_p
            pl.BlockSpec((nz8, nx128), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),  # ring
        ],
        out_specs=pl.BlockSpec((1, nt, nx128), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nz8, nx128), jnp.float32),  # vx
            pltpu.VMEM((nz8, nx128), jnp.float32),  # vz
            pltpu.VMEM((nz8, nx128), jnp.float32),  # px
            pltpu.VMEM((nz8, nx128), jnp.float32),  # pz
        ],
    )
    hist = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ns, nt, nx128), jnp.float32),
    )(src_z_p, src_x_p, rcv_row, wavelet, kappa_dt, ax_v, az_v, ax_p,
      az_p, ring)
    # gather receiver columns (per-shot) on the host side of the kernel
    cols = (rcv_x + w).astype(jnp.int32)  # [ns, nr]
    recs = jnp.take_along_axis(hist, cols[:, None, :], axis=2)
    return recs
