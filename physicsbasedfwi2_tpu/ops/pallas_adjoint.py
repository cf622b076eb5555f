"""Pallas adjoint (reverse-mode) kernel for the acoustic propagator.

Implements the exact transpose of the forward scheme in
:mod:`physicsbasedfwi2_tpu.ops.pallas_kernels` with
checkpoint/recompute time reversal:

- forward sweep stores the 4-field state every K steps into an HBM
  checkpoint buffer (manual async DMA),
- the reverse sweep walks chunks backwards: restore checkpoint,
  recompute the K steps caching the two stress-divergence terms
  (Dxb vx, Dzb vz) in VMEM, then run K adjoint steps, accumulating
  the kappa-gradient imaging condition.

Derivation (forward step f: s_t -> s_{t+1}, a = dt/dx,
k2 = vp^2*dt/dx):
    vx1 = Ax_v(vx0 + a Dxf(p0)),   p0 = px0+pz0
    vz1 = Az_v(vz0 + a Dzf(p0))
    px1 = Ax_p(px0 + k2 Dxb(vx1))
    pz1 = Az_p(pz0 + k2 Dzb(vz1)) + src
    y_t = (px1+pz1)[rrow]
transpose (using Dxb^T = -Dxf, Dzb^T = -Dzf, Dxf^T = -Dxb):
    pbx1 += S^T ybar_t ; pbz1 += S^T ybar_t
    pbz0 = Az_p pbz1 ; vbz1 += -Dzf(k2 Az_p pbz1) ; k2bar += Az_p pbz1 . Dzb(vz1)
    pbx0 = Ax_p pbx1 ; vbx1 += -Dxf(k2 Ax_p pbx1) ; k2bar += Ax_p pbx1 . Dxb(vx1)
    vbz0 = Az_v vbz1 ; pb0 += -a Dzb(Az_v vbz1)
    vbx0 = Ax_v vbx1 ; pb0 += -a Dxb(Ax_v vbx1)
    pbx0 += pb0 ; pbz0 += pb0
finally dJ/dvp = k2bar * 2*vp*dt/dx (+ pad-transpose).

The source-gain dependence on vp at the source cell IS included
(k2bar[src] += apz[src]*wav_t/dx): the adjoint field focuses at the
source, so this single-cell term is O(1) of the gradient.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from physicsbasedfwi2_tpu.ops.acoustic import AcousticConfig
from physicsbasedfwi2_tpu.ops.pallas_kernels import (
    _dx_fwd, _dx_bwd, _dz_fwd, _dz_bwd, _prepare, _round_up,
    acoustic_forward_pallas,
)


def _bwd_kernel(src_z, src_x, rcv_row, wav_sm,
                kappa2_ref, ax_v_ref, az_v_ref, ax_p_ref, az_p_ref,
                ring_ref, ghist_hbm, gk_out_ref, ckpt_hbm,
                vx, vz, px, pz, avx, avz, apx, apz, gk, dxv_buf, dzv_buf,
                gh_buf, sem, *, nt: int, n_ck: int, K: int, nxp: int,
                dt: float, inv_dx: float):
    shot = pl.program_id(0)
    sz = src_z[shot]
    sx = src_x[shot]
    rrow = rcv_row[shot]
    a = dt * inv_dx

    kappa2 = kappa2_ref[:]  # vp^2*dt/dx on padded grid
    ax_v = ax_v_ref[:] * ring_ref[:]
    az_v = az_v_ref[:] * ring_ref[:]
    ax_p = ax_p_ref[:] * ring_ref[:]
    az_p = az_p_ref[:] * ring_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, nxp), 1)
    src_onehot = (col == sx).astype(jnp.float32)
    src_kap = kappa2_ref[pl.ds(sz, 1), :]
    src_gain = jnp.sum(src_kap * src_onehot) * inv_dx

    @pl.when(shot == 0)
    def _():
        gk_out_ref[:] = jnp.zeros_like(gk_out_ref)

    # zero fields
    for r in (vx, vz, px, pz, avx, avz, apx, apz, gk):
        r[:] = jnp.zeros_like(r)

    def fstep(t):
        """One forward step on (vx, vz, px, pz) scratch."""
        p = px[:] + pz[:]
        vx[:] = ax_v * (vx[:] + a * _dx_fwd(p))
        vz[:] = az_v * (vz[:] + a * _dz_fwd(p))
        px[:] = ax_p * (px[:] + kappa2 * _dx_bwd(vx[:]))
        pz[:] = az_p * (pz[:] + kappa2 * _dz_bwd(vz[:]))
        amp = wav_sm[shot, t]
        cur = pz[pl.ds(sz, 1), :]
        pz[pl.ds(sz, 1), :] = cur + amp * src_gain * src_onehot

    # ---- forward sweep with checkpoints every K steps ----
    def fwd_body(t, _):
        @pl.when(jax.lax.rem(t, K) == 0)
        def _():
            c = t // K
            for f_i, r in enumerate((vx, vz, px, pz)):
                cp = pltpu.make_async_copy(r, ckpt_hbm.at[c, f_i], sem)
                cp.start()
                cp.wait()
        fstep(t)
        return 0

    jax.lax.fori_loop(0, n_ck * K, fwd_body, 0)

    # ---- reverse sweep ----
    def chunk_body(ci, _):
        c = n_ck - 1 - ci
        t0 = c * K
        # restore checkpoint c
        for f_i, r in enumerate((vx, vz, px, pz)):
            cp = pltpu.make_async_copy(ckpt_hbm.at[c, f_i], r, sem)
            cp.start()
            cp.wait()
        # fetch this chunk's receiver-row cotangents
        gh = pltpu.make_async_copy(
            ghist_hbm.at[shot, pl.ds(t0, K), :], gh_buf, sem)
        gh.start()
        gh.wait()

        # recompute chunk, caching stress divergences per step
        def rec_body(kk, _):
            t = t0 + kk
            fstep(t)
            dxv_buf[pl.ds(kk, 1), :, :] = _dx_bwd(vx[:])[None]
            dzv_buf[pl.ds(kk, 1), :, :] = _dz_bwd(vz[:])[None]
            return 0

        jax.lax.fori_loop(0, K, rec_body, 0)

        # adjoint steps, reverse order within chunk
        def adj_body(kk_r, _):
            kk = K - 1 - kk_r
            t = t0 + kk
            # receiver cotangent scatter into the rrow row
            ybar = gh_buf[pl.ds(kk, 1), :]  # [1, nxp]
            apx[pl.ds(rrow, 1), :] = apx[pl.ds(rrow, 1), :] + ybar
            apz[pl.ds(rrow, 1), :] = apz[pl.ds(rrow, 1), :] + ybar

            # source-gain term: the source amplitude scales with
            # k2[src]/dx, so k2bar[src] += apz[src]*wav_t/dx — the
            # adjoint field focuses at the source, making this term
            # O(1) of the gradient, not negligible.
            amp_t = wav_sm[shot, t]
            gk[pl.ds(sz, 1), :] = (gk[pl.ds(sz, 1), :]
                                   + (amp_t * inv_dx)
                                   * apz[pl.ds(sz, 1), :] * src_onehot)

            wz = az_p * apz[:]
            wx = ax_p * apx[:]
            gk[:] = (gk[:] + wx * dxv_buf[pl.ds(kk, 1)][0]
                     + wz * dzv_buf[pl.ds(kk, 1)][0])
            vbx1 = avx[:] - _dx_fwd(kappa2 * wx)
            vbz1 = avz[:] - _dz_fwd(kappa2 * wz)
            pb0 = -a * (_dx_bwd(ax_v * vbx1) + _dz_bwd(az_v * vbz1))
            apx[:] = wx + pb0
            apz[:] = wz + pb0
            avx[:] = ax_v * vbx1
            avz[:] = az_v * vbz1
            return 0

        jax.lax.fori_loop(0, K, adj_body, 0)
        return 0

    jax.lax.fori_loop(0, n_ck, chunk_body, 0)
    gk_out_ref[:] = gk_out_ref[:] + gk[:]


def _pallas_backward(vp, wavelet, src_z, src_x, rcv_z, rcv_x,
                     cfg: AcousticConfig, ybar_rows):
    """ybar_rows: [ns, nt_pad, nx128] receiver-row cotangents.
    Returns dJ/dvp [nz, nx]."""
    g = cfg.grid
    ns = int(src_z.shape[0])
    K = 16
    n_ck = -(-g.nt // K)
    nt_pad = n_ck * K
    kappa_dt, ax_v, az_v, ax_p, az_p, ring, (nz8, nx128) = _prepare(vp, cfg)
    kappa2 = kappa_dt * (1.0 / g.dx)
    top, w = g.top_pad, g.pml_width

    if wavelet.ndim == 1:
        wavelet = jnp.broadcast_to(wavelet[None, :], (ns, g.nt))
    wav = jnp.pad(wavelet.astype(jnp.float32), ((0, 0), (0, nt_pad - g.nt)))

    src_z_p = (src_z + top).astype(jnp.int32)
    src_x_p = (src_x + w).astype(jnp.int32)
    rcv_row = (rcv_z[:, 0] + top).astype(jnp.int32)

    kern = functools.partial(_bwd_kernel, nt=g.nt, n_ck=n_ck, K=K,
                             nxp=nx128, dt=g.dt, inv_dx=1.0 / g.dx)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ns,),
        in_specs=[
            pl.BlockSpec((nz8, nx128), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),  # kappa2
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
            pl.BlockSpec(memory_space=pl.ANY),   # ghist (HBM)
        ],
        out_specs=(
            pl.BlockSpec((nz8, nx128), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),  # gk accumulator
            pl.BlockSpec(memory_space=pl.ANY),   # ckpt buffer (HBM)
        ),
        scratch_shapes=[
            pltpu.VMEM((nz8, nx128), jnp.float32),  # vx
            pltpu.VMEM((nz8, nx128), jnp.float32),  # vz
            pltpu.VMEM((nz8, nx128), jnp.float32),  # px
            pltpu.VMEM((nz8, nx128), jnp.float32),  # pz
            pltpu.VMEM((nz8, nx128), jnp.float32),  # avx
            pltpu.VMEM((nz8, nx128), jnp.float32),  # avz
            pltpu.VMEM((nz8, nx128), jnp.float32),  # apx
            pltpu.VMEM((nz8, nx128), jnp.float32),  # apz
            pltpu.VMEM((nz8, nx128), jnp.float32),  # gk local
            pltpu.VMEM((K, nz8, nx128), jnp.float32),  # dxv cache
            pltpu.VMEM((K, nz8, nx128), jnp.float32),  # dzv cache
            pltpu.VMEM((K, nx128), jnp.float32),       # ghist chunk
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    gk, _ckpt = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nz8, nx128), jnp.float32),
            jax.ShapeDtypeStruct((n_ck, 4, nz8, nx128), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(src_z_p, src_x_p, rcv_row, wav, kappa2, ax_v, az_v, ax_p, az_p,
      ring, ybar_rows)

    # chain rule k2 = vp^2*dt/dx -> vp, then transpose the edge-pad
    vp_pad = jnp.pad(vp.astype(jnp.float32),
                     ((top, w), (w, w)), mode="edge")
    nzp, nxp_r = vp_pad.shape
    gk = gk[:nzp, :nxp_r]
    gvp_pad = gk * (2.0 * vp_pad * g.dt / g.dx)
    # transpose of edge-pad: fold pad strips into edge rows/cols
    # rows
    gz = gvp_pad
    row_top = jnp.sum(gz[:top, :], axis=0) if top else 0.0
    row_bot = jnp.sum(gz[top + g.nz :, :], axis=0)
    gz = gz[top : top + g.nz, :]
    gz = gz.at[0, :].add(row_top)
    gz = gz.at[-1, :].add(row_bot)
    # cols
    col_l = jnp.sum(gz[:, :w], axis=1)
    col_r = jnp.sum(gz[:, w + g.nx :], axis=1)
    gz = gz[:, w : w + g.nx]
    gz = gz.at[:, 0].add(col_l)
    gz = gz.at[:, -1].add(col_r)
    return gz


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def acoustic_pallas(vp, wavelet, src_z, src_x, rcv_z, rcv_x,
                    cfg: AcousticConfig):
    """Differentiable Pallas acoustic simulation (same contract as
    :func:`simulate_acoustic`; gradient w.r.t. vp only)."""
    return acoustic_forward_pallas(vp, wavelet, src_z, src_x, rcv_z,
                                   rcv_x, cfg)


def _fwd(vp, wavelet, src_z, src_x, rcv_z, rcv_x, cfg):
    recs = acoustic_forward_pallas(vp, wavelet, src_z, src_x, rcv_z,
                                   rcv_x, cfg)
    return recs, (vp, wavelet, src_z, src_x, rcv_z, rcv_x)


def _int_cotangent(x):
    import numpy as _np
    return _np.zeros(x.shape, dtype=jax.dtypes.float0)


def _bwd(cfg, res, ybar):
    vp, wavelet, src_z, src_x, rcv_z, rcv_x = res
    g = cfg.grid
    ns = int(src_z.shape[0])
    K = 16
    n_ck = -(-g.nt // K)
    nt_pad = n_ck * K
    nx128 = _round_up(g.nx + 2 * g.pml_width, 128)
    # scatter receiver cotangents into their row columns
    cols = (rcv_x + g.pml_width).astype(jnp.int32)  # [ns, nr]
    rows = jnp.zeros((ns, nt_pad, nx128), jnp.float32)
    si = jnp.arange(ns)[:, None, None]
    ti = jnp.arange(g.nt)[None, :, None]
    rows = rows.at[si, ti, cols[:, None, :]].add(ybar)
    gvp = _pallas_backward(vp, wavelet, src_z, src_x, rcv_z, rcv_x, cfg,
                           rows)
    zeros_w = jnp.zeros_like(wavelet)
    return (gvp, zeros_w, _int_cotangent(src_z), _int_cotangent(src_x),
            _int_cotangent(rcv_z), _int_cotangent(rcv_x))


acoustic_pallas.defvjp(_fwd, _bwd)
