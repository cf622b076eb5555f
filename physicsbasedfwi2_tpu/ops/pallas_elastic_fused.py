"""Fully-fused elastic FWI loss+gradient kernel.

The elastic analogue of :mod:`ops.pallas_fwi_fused` — replaces the
reference's DENISE one-iteration gradient call (networks.py:7787
``d.grad`` + file plumbing) with one Pallas program per shot that
never leaves the chip:

1. forward sweep of the 5-field sponge scheme (the same physics as
   :mod:`ops.elastic_fast`), checkpointing the full state every KC
   steps to HBM and accumulating the MSE data misfit on the receiver
   rows,
2. reverse sweep: per chunk, restore the checkpoint, recompute the
   KC forward steps caching the five derivative combinations each
   step, then run the exact hand-derived transpose of the update,
   injecting the misfit cotangent rows and accumulating the gradients
   w.r.t. the five medium fields (lam, lam+2mu, mu_xz, bx, bz).

Gradients w.r.t. (vp, vs, rho) come from ``jax.vjp`` of the pure-JAX
medium-preparation function — the kernel never needs the chain rule.

Frequency continuation composes with this kernel on the SOURCE side
(low-pass the wavelet + the stored observed data once per stage; by
linearity that equals filtering the prediction — DENISE's own
FC_SPIKE band limit, networks.py:7711-7713).

Forward step (dtx = dt/dx; D{x,z}{f,b} = 4th-order staggered
derivatives in grid units, circular rolls + a zero ring):

    t1  = Dxf(sxx) + Dzb(sxz)
    vx' = damp*(vx + dtx*bx*t1)
    t2  = Dxb(sxz) + Dzf(szz)
    vz' = damp*(vz + dtx*bz*t2)
    a   = Dxb(vx');  b = Dzb(vz')
    sxx' = damp*(sxx + dtx*(l2m*a + lam*b)) + s_t
    szz' = fs ⊙ (damp*(szz + dtx*(lam*a + l2m*b)) + s_t)
    c   = Dxf(vz') + Dzf(vx')
    sxz' = damp*(sxz + dtx*muxz*c)
    J  += inv_n * sum_r [(vx'[rrow,r]-ox)^2 + (vz'[rrow,r]-oz)^2]

Exact transpose (D{x}f^T = -Dxb etc. under circular shifts; diagonal
ops self-adjoint), processed in reverse assignment order — see
``_adjoint_step`` and the pure-JAX replica
:func:`elastic_fused_reference` that the tests diff against.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from physicsbasedfwi2_tpu.ops import pml
from physicsbasedfwi2_tpu.ops.elastic import ElasticConfig, _staggered_medium
from physicsbasedfwi2_tpu.ops.pallas_kernels import (
    _round_up, _dx_fwd, _dx_bwd, _dz_fwd, _dz_bwd,
)

RING = 2  # zero ring width for circular rolls


@jax.custom_vjp
def _abs0(x):
    """|x| with the sign(0)=0 subgradient (torch L1Loss convention;
    lax.abs uses +1 at x == 0)."""
    return jnp.abs(x)


def _abs0_fwd(x):
    return jnp.abs(x), jnp.sign(x)


def _abs0_bwd(s, g):
    return (g * s,)


_abs0.defvjp(_abs0_fwd, _abs0_bwd)


def prep_medium(vp, vs, rho, cfg: ElasticConfig):
    """(vp, vs, rho) -> kernel-layout (lam, l2m, muxz, bx, bz), each
    [nz8, nx128].  Pure JAX — differentiate with jax.vjp to pull
    kernel gradients back to the physical fields."""
    g = cfg.grid
    w = g.pml_width
    top = RING if g.free_surface else g.pml_width
    pad = ((top, w), (w, w))
    vp_p = jnp.pad(vp.astype(jnp.float32), pad, mode="edge")
    vs_p = jnp.pad(vs.astype(jnp.float32), pad, mode="edge")
    rho_p = jnp.pad(rho.astype(jnp.float32), pad, mode="edge")
    lam, mu, muxz, bx, bz = _staggered_medium(vp_p, vs_p, rho_p)
    l2m = lam + 2.0 * mu
    nzp, nxp = vp_p.shape
    nz8 = _round_up(nzp, 8)
    nx128 = _round_up(nxp, 128)

    def padp(a):
        return jnp.pad(a, ((0, nz8 - nzp), (0, nx128 - nxp)),
                       mode="edge")

    return tuple(padp(m) for m in (lam, l2m, muxz, bx, bz))


def _layout(cfg: ElasticConfig):
    g = cfg.grid
    w = g.pml_width
    top = RING if g.free_surface else g.pml_width
    nzp = g.nz + top + w
    nxp = g.nx + 2 * w
    return top, w, nzp, nxp, _round_up(nzp, 8), _round_up(nxp, 128)


def prep_damp(cfg: ElasticConfig):
    """Sponge decay * zero ring, kernel layout [nz8, nx128].
    Pure jnp (jit-traceable — the engine builds it under jit)."""
    g = cfg.grid
    top, w, nzp, nxp, nz8, nx128 = _layout(cfg)
    top_abs = 0 if g.free_surface else w
    sx = pml.sigma_profile(nxp, w, w, g.dx, cfg.vmax_pml) * 0.5
    sz = pml.sigma_profile(nzp, top_abs, w, g.dx, cfg.vmax_pml) * 0.5
    damp = jnp.exp(-(sz[:, None] + sx[None, :]) * g.dt)
    full = jnp.zeros((nz8, nx128), jnp.float32)
    full = full.at[:nzp, :nxp].set(damp)
    r = jnp.arange(nz8)[:, None]
    c = jnp.arange(nx128)[None, :]
    ring = ((r >= RING) & (r < nzp - RING)
            & (c >= RING) & (c < nxp - RING)).astype(jnp.float32)
    return full * ring


def scatter_rows_el(data, rcv_x, cfg: ElasticConfig, *, KC: int):
    """[ns, nt, nr] traces -> [ns, nt_pad, nx128] receiver-row
    layout (kernel x-offset = pml_width [+0 z-irrelevant])."""
    g = cfg.grid
    _, w, _, _, _, nx128 = _layout(cfg)
    ns = data.shape[0]
    nt_pad = -(-g.nt // KC) * KC
    cols = (rcv_x + w).astype(jnp.int32)
    rows = jnp.zeros((ns, nt_pad, nx128), jnp.float32)
    si = jnp.arange(ns)[:, None, None]
    ti = jnp.arange(g.nt)[None, :, None]
    return rows.at[si, ti, cols[:, None, :]].add(data)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _kernel(src_z, src_x, rcv_row, wav_sm, rcv_x_sm,
            lam_r, l2m_r, muxz_r, bx_r, bz_r, damp_r, ox_hbm, oz_hbm,
            *refs,
            nt: int, n_ck: int, KC: int, nzp: int, nxp: int,
            dtx: float, dt_invdx2: float, fs_row: int,
            inv_count: float, nr: int, misfit: str = "l2"):
    if misfit == "tnl1":
        (loss_out, glam_out, gl2m_out, gmuxz_out, gbx_out, gbz_out,
         ckpt_hbm, prx_hbm, prz_hbm,
         vx, vz, sxx, szz, sxz,
         Vx, Vz, Sxx, Szz, Sxz,
         c_t1, c_t2, c_a, c_b, c_c, rows_x, rows_z, obx, obz,
         sem) = refs
    else:
        (loss_out, glam_out, gl2m_out, gmuxz_out, gbx_out, gbz_out,
         ckpt_hbm,
         vx, vz, sxx, szz, sxz,
         Vx, Vz, Sxx, Szz, Sxz,
         c_t1, c_t2, c_a, c_b, c_c, rows_x, rows_z, obx, obz,
         sem) = refs
        prx_hbm = prz_hbm = None
    shot = pl.program_id(0)
    sz_i = src_z[shot]
    sx_i = src_x[shot]
    rrow = rcv_row[shot]
    lam = lam_r[:]
    l2m = l2m_r[:]
    muxz = muxz_r[:]
    bx = bx_r[:]
    bz = bz_r[:]
    damp = damp_r[:]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, nxp), 1)
    src_onehot = (col == sx_i).astype(jnp.float32)
    l2m_src = jnp.sum(l2m_r[pl.ds(sz_i, 1), :] * src_onehot)
    src_gain = dt_invdx2 * l2m_src
    rmask = jnp.zeros((1, nxp), jnp.float32)
    for r in range(nr):
        rmask = rmask + (col == rcv_x_sm[shot, r]).astype(jnp.float32)
    rmask = jnp.minimum(rmask, 1.0)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (vx.shape[0], 1), 0)
    fs = (row_i != fs_row).astype(jnp.float32) if fs_row >= 0 else None
    # 2D source-cell mask (Mosaic cannot dynamic_slice values)
    src_mask2d = ((row_i == sz_i).astype(jnp.float32) * src_onehot)
    onehot00 = ((jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0)
                & (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) == 0)
                ).astype(jnp.float32)

    @pl.when(shot == 0)
    def _():
        loss_out[:] = jnp.zeros_like(loss_out)
        for o in (glam_out, gl2m_out, gmuxz_out, gbx_out, gbz_out):
            o[:] = jnp.zeros_like(o)

    for r_ in (vx, vz, sxx, szz, sxz, Vx, Vz, Sxx, Szz, Sxz):
        r_[:] = jnp.zeros_like(r_)

    def fwd_update(t):
        """One forward step in-place; returns nothing."""
        t1 = _dx_fwd(sxx[:]) + _dz_bwd(sxz[:])
        vx[:] = damp * (vx[:] + dtx * bx * t1)
        t2 = _dx_bwd(sxz[:]) + _dz_fwd(szz[:])
        vz[:] = damp * (vz[:] + dtx * bz * t2)
        a = _dx_bwd(vx[:])
        b = _dz_bwd(vz[:])
        amp = wav_sm[shot, t] * src_gain
        sxx[:] = (damp * (sxx[:] + dtx * (l2m * a + lam * b)))
        sxx[pl.ds(sz_i, 1), :] = (sxx[pl.ds(sz_i, 1), :]
                                  + amp * src_onehot)
        new_szz = damp * (szz[:] + dtx * (lam * a + l2m * b))
        szz[:] = new_szz
        szz[pl.ds(sz_i, 1), :] = (szz[pl.ds(sz_i, 1), :]
                                  + amp * src_onehot)
        if fs is not None:
            szz[:] = szz[:] * fs
        cc = _dx_fwd(vz[:]) + _dz_fwd(vx[:])
        sxz[:] = damp * (sxz[:] + dtx * muxz * cc)
        return t1, t2, a, b, cc

    # ---- phase 1: forward + checkpoints (+ inline L2 loss) ----
    def fwd_chunk(c, loss_acc):
        t0 = c * KC
        for f_i, r_ in enumerate((vx, vz, sxx, szz, sxz)):
            cp = pltpu.make_async_copy(r_, ckpt_hbm.at[shot, c, f_i],
                                       sem)
            cp.start()
            cp.wait()
        if misfit == "tnl1":
            rows_x[:] = jnp.zeros_like(rows_x)
            rows_z[:] = jnp.zeros_like(rows_z)
        else:
            for hbm, buf in ((ox_hbm, obx), (oz_hbm, obz)):
                cp = pltpu.make_async_copy(
                    hbm.at[shot, pl.ds(t0, KC), :], buf, sem)
                cp.start()
                cp.wait()

        def step(kk, acc):
            t = t0 + kk
            fwd_update(t)
            if misfit == "tnl1":
                # save the receiver rows; the misfit phase consumes
                # the whole history (per-trace max is global in time)
                @pl.when(t < nt)
                def _():
                    rows_x[pl.ds(kk, 1), :] = vx[pl.ds(rrow, 1), :]
                    rows_z[pl.ds(kk, 1), :] = vz[pl.ds(rrow, 1), :]
                return acc
            rx_ = vx[pl.ds(rrow, 1), :]
            rz_ = vz[pl.ds(rrow, 1), :]
            dx_ = (rx_ - obx[pl.ds(kk, 1), :]) * rmask
            dz_ = (rz_ - obz[pl.ds(kk, 1), :]) * rmask
            inc = jnp.sum(dx_ * dx_) + jnp.sum(dz_ * dz_)
            return acc + jnp.where(t < nt, inc, 0.0)

        acc = jax.lax.fori_loop(0, KC, step, loss_acc)
        if misfit == "tnl1":
            for buf, hbm in ((rows_x, prx_hbm), (rows_z, prz_hbm)):
                cp = pltpu.make_async_copy(buf, hbm.at[shot, c], sem)
                cp.start()
                cp.wait()
        return acc

    loss_raw = jax.lax.fori_loop(0, n_ck, fwd_chunk, 0.0)
    if misfit != "tnl1":
        loss_out[:] = loss_out[:] + (loss_raw * inv_count) * onehot00

    # ---- phase 1.5 (tnl1): per-trace-max-normalized L1 misfit +
    # cotangent rows, the acoustic kernel's 4-sweep scheme
    # (pallas_fwi_fused.py:126-180) applied per component; the
    # cotangent overwrites the predicted-row history in HBM ----
    if misfit == "tnl1":
        def _tn_misfit(pr_hbm, o_hbm, pbuf, obuf):
            def max_sweep(c, m):
                cp = pltpu.make_async_copy(pr_hbm.at[shot, c], pbuf,
                                           sem)
                cp.start()
                cp.wait()
                return jnp.maximum(m, jnp.max(jnp.abs(pbuf[:]), axis=0,
                                              keepdims=True))

            m = jax.lax.fori_loop(0, n_ck, max_sweep,
                                  jnp.zeros((1, nxp), jnp.float32))
            inv_m = 1.0 / (m + 1e-10)

            def tie_sweep(c, cnt):
                cp = pltpu.make_async_copy(pr_hbm.at[shot, c], pbuf,
                                           sem)
                cp.start()
                cp.wait()
                eq = (jnp.abs(pbuf[:]) == m).astype(jnp.float32)
                return cnt + jnp.sum(eq, axis=0, keepdims=True)

            cnt = jax.lax.fori_loop(0, n_ck, tie_sweep,
                                    jnp.zeros((1, nxp), jnp.float32))
            inv_cnt = 1.0 / jnp.maximum(cnt, 1.0)

            def loss_sweep(c, carry):
                loss_acc, S = carry
                cp = pltpu.make_async_copy(pr_hbm.at[shot, c], pbuf,
                                           sem)
                cp.start()
                cp.wait()
                ob = pltpu.make_async_copy(
                    o_hbm.at[shot, pl.ds(c * KC, KC), :], obuf, sem)
                ob.start()
                ob.wait()
                # divide (not multiply by the reciprocal): the sign of
                # r at near-tie samples (argmax where yn ~ obs = +-1)
                # must match trace_normalize's f32 division bit-exactly
                yn = pbuf[:] / (m + 1e-10)
                r = (yn - obuf[:]) * rmask
                g = jnp.sign(r) * inv_count
                return (loss_acc + jnp.sum(jnp.abs(r)),
                        S + jnp.sum(g * yn, axis=0, keepdims=True))

            loss_c, S = jax.lax.fori_loop(
                0, n_ck, loss_sweep,
                (0.0, jnp.zeros((1, nxp), jnp.float32)))
            corr = inv_cnt * S * inv_m

            def ybar_sweep(c, _):
                cp = pltpu.make_async_copy(pr_hbm.at[shot, c], pbuf,
                                           sem)
                cp.start()
                cp.wait()
                ob = pltpu.make_async_copy(
                    o_hbm.at[shot, pl.ds(c * KC, KC), :], obuf, sem)
                ob.start()
                ob.wait()
                yk = pbuf[:]
                yn = yk / (m + 1e-10)
                g = jnp.sign((yn - obuf[:]) * rmask) * inv_count
                star = (jnp.abs(yk) == m).astype(jnp.float32)
                pbuf[:] = g * inv_m - star * jnp.sign(yk) * corr
                cp = pltpu.make_async_copy(pbuf, pr_hbm.at[shot, c],
                                           sem)
                cp.start()
                cp.wait()
                return 0

            jax.lax.fori_loop(0, n_ck, ybar_sweep, 0)
            return loss_c

        loss_x = _tn_misfit(prx_hbm, ox_hbm, rows_x, obx)
        loss_z = _tn_misfit(prz_hbm, oz_hbm, rows_z, obz)
        loss_out[:] = (loss_out[:]
                       + ((loss_x + loss_z) * inv_count) * onehot00)

    # ---- phase 2: reverse sweep ----
    for r_ in (Vx, Vz, Sxx, Szz, Sxz):
        r_[:] = jnp.zeros_like(r_)

    def bwd_chunk(ci, _):
        c = n_ck - 1 - ci
        t0 = c * KC
        for f_i, r_ in enumerate((vx, vz, sxx, szz, sxz)):
            cp = pltpu.make_async_copy(ckpt_hbm.at[shot, c, f_i], r_,
                                       sem)
            cp.start()
            cp.wait()
        if misfit == "tnl1":
            # the history now holds the precomputed cotangent rows
            for hbm, buf in ((prx_hbm, rows_x), (prz_hbm, rows_z)):
                cp = pltpu.make_async_copy(hbm.at[shot, c], buf, sem)
                cp.start()
                cp.wait()
        else:
            for hbm, buf in ((ox_hbm, obx), (oz_hbm, obz)):
                cp = pltpu.make_async_copy(
                    hbm.at[shot, pl.ds(t0, KC), :], buf, sem)
                cp.start()
                cp.wait()

        def rec(kk, _):
            t = t0 + kk
            t1, t2, a, b, cc = fwd_update(t)
            c_t1[pl.ds(kk, 1), :, :] = t1[None]
            c_t2[pl.ds(kk, 1), :, :] = t2[None]
            c_a[pl.ds(kk, 1), :, :] = a[None]
            c_b[pl.ds(kk, 1), :, :] = b[None]
            c_c[pl.ds(kk, 1), :, :] = cc[None]
            if misfit != "tnl1":
                rows_x[pl.ds(kk, 1), :] = vx[pl.ds(rrow, 1), :]
                rows_z[pl.ds(kk, 1), :] = vz[pl.ds(rrow, 1), :]
            return 0

        jax.lax.fori_loop(0, KC, rec, 0)

        def adj(kk_r, _):
            kk = KC - 1 - kk_r
            t = t0 + kk
            amp = wav_sm[shot, t]
            live = (t < nt).astype(jnp.float32)
            # misfit cotangent on the receiver rows
            if misfit == "tnl1":
                gx = rows_x[pl.ds(kk, 1), :]
                gz = rows_z[pl.ds(kk, 1), :]
            else:
                gx = (2.0 * inv_count * live
                      * (rows_x[pl.ds(kk, 1), :] - obx[pl.ds(kk, 1), :])
                      * rmask)
                gz = (2.0 * inv_count * live
                      * (rows_z[pl.ds(kk, 1), :] - obz[pl.ds(kk, 1), :])
                      * rmask)
            Vx[pl.ds(rrow, 1), :] = Vx[pl.ds(rrow, 1), :] + gx
            Vz[pl.ds(rrow, 1), :] = Vz[pl.ds(rrow, 1), :] + gz

            t1 = c_t1[pl.ds(kk, 1)][0]
            t2 = c_t2[pl.ds(kk, 1)][0]
            a = c_a[pl.ds(kk, 1)][0]
            b = c_b[pl.ds(kk, 1)][0]
            cc = c_c[pl.ds(kk, 1)][0]

            # 1. sxz' = damp*(sxz + dtx*muxz*c)
            w5 = damp * Sxz[:]
            sxz_old = w5
            cbar = dtx * muxz * w5
            gmuxz_out[:] = gmuxz_out[:] + dtx * cc * w5
            Vz[:] = Vz[:] - _dx_bwd(cbar)
            Vx[:] = Vx[:] - _dz_bwd(cbar)

            # 2. szz' = fs.(damp*(szz + dtx*(lam a + l2m b)) + s_t)
            w4 = Szz[:] * fs if fs is not None else Szz[:]
            szz_old = damp * w4
            abar = dtx * lam * damp * w4
            bbar = dtx * l2m * damp * w4
            glam_out[:] = glam_out[:] + dtx * a * damp * w4
            gl2m_out[:] = gl2m_out[:] + dtx * b * damp * w4
            # 3. sxx' = damp*(sxx + dtx*(l2m a + lam b)) + s_t
            sxx_old = damp * Sxx[:]
            abar = abar + dtx * l2m * damp * Sxx[:]
            bbar = bbar + dtx * lam * damp * Sxx[:]
            gl2m_out[:] = gl2m_out[:] + dtx * a * damp * Sxx[:]
            glam_out[:] = glam_out[:] + dtx * b * damp * Sxx[:]
            # source-gain chain: s_t = amp*dt_invdx2*l2m[src]*onehot
            src_cot = jnp.sum((Sxx[:] + w4) * src_mask2d)
            gl2m_out[:] = (gl2m_out[:]
                           + (amp * dt_invdx2 * src_cot) * src_mask2d)
            # 4. a = Dxb(vx'), b = Dzb(vz')
            Vx[:] = Vx[:] - _dx_fwd(abar)
            Vz[:] = Vz[:] - _dz_fwd(bbar)
            # 5. vz' = damp*(vz + dtx*bz*t2)
            w2 = damp * Vz[:]
            t2bar = dtx * bz * w2
            gbz_out[:] = gbz_out[:] + dtx * t2 * w2
            sxz_old = sxz_old - _dx_fwd(t2bar)
            szz_old = szz_old - _dz_bwd(t2bar)
            # 6. vx' = damp*(vx + dtx*bx*t1)
            w1 = damp * Vx[:]
            t1bar = dtx * bx * w1
            gbx_out[:] = gbx_out[:] + dtx * t1 * w1
            sxx_old = sxx_old - _dx_bwd(t1bar)
            sxz_old = sxz_old - _dz_fwd(t1bar)

            Vx[:] = w1
            Vz[:] = w2
            Sxx[:] = sxx_old
            Szz[:] = szz_old
            Sxz[:] = sxz_old
            return 0

        jax.lax.fori_loop(0, KC, adj, 0)
        return 0

    jax.lax.fori_loop(0, n_ck, bwd_chunk, 0)


def fused_elastic_loss_grad_meds(meds, damp, wavelet, src_z, src_x,
                                 rcv_z, rcv_x, cfg: ElasticConfig,
                                 obs_rows_x, obs_rows_z, *, KC: int = 8,
                                 misfit: str = "l2",
                                 interpret: bool = False):
    """(loss, grads w.r.t. the 5 medium fields) via the fused kernel.

    meds: output of :func:`prep_medium`.
    obs_rows_*: :func:`scatter_rows_el` layouts of the observed data.
    misfit: "l2" — DENISE's raw MSE, cotangent computed inline in the
        reverse sweep; "tnl1" — the reference's trace-normalized L1
        (networks.py:5418-5476 conditioning applied to the elastic
        components): obs_rows_* must be scattered from PRE-normalized
        traces, the forward saves the receiver-row history to HBM,
        and a 4-sweep misfit phase (per-trace max; tie counts;
        loss+S; cotangent write — the exact jnp.max subgradient, as
        pallas_fwi_fused) runs per component before the reverse
        sweep.  Receiver columns must be distinct per shot (the
        row-scatter is the trace identity).
    """
    g = cfg.grid
    top, w, nzp, nxp, nz8, nx128 = _layout(cfg)
    ns = int(src_z.shape[0])
    nr = int(rcv_x.shape[1])
    n_ck = -(-g.nt // KC)
    nt_pad = n_ck * KC
    if wavelet.ndim == 1:
        wavelet = jnp.broadcast_to(wavelet[None, :], (ns, g.nt))
    wav = jnp.pad(wavelet.astype(jnp.float32),
                  ((0, 0), (0, nt_pad - g.nt)))
    src_z_p = (src_z + top).astype(jnp.int32)
    src_x_p = (src_x + w).astype(jnp.int32)
    rcv_row = (rcv_z[:, 0] + top).astype(jnp.int32)
    rcv_cols = (rcv_x + w).astype(jnp.int32)
    fs_row = top if g.free_surface else -1
    inv_count = 1.0 / float(ns * g.nt * nr)

    kern = functools.partial(
        _kernel, nt=g.nt, n_ck=n_ck, KC=KC, nzp=nzp, nxp=nx128,
        dtx=g.dt / g.dx, dt_invdx2=g.dt / (g.dx * g.dx), fs_row=fs_row,
        inv_count=inv_count, nr=nr, misfit=misfit)
    spec = pl.BlockSpec((nz8, nx128), lambda i, *_: (0, 0),
                        memory_space=pltpu.VMEM)
    fld = lambda: pltpu.VMEM((nz8, nx128), jnp.float32)  # noqa: E731
    out_specs = [
        pl.BlockSpec((8, 128), lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),          # loss
        spec, spec, spec, spec, spec,                   # 5 grads
        pl.BlockSpec(memory_space=pl.ANY),           # ckpt
    ]
    out_shape = [
        jax.ShapeDtypeStruct((8, 128), jnp.float32),
        *(jax.ShapeDtypeStruct((nz8, nx128), jnp.float32)
          for _ in range(5)),
        jax.ShapeDtypeStruct((ns, n_ck, 5, nz8, nx128), jnp.float32),
    ]
    if misfit == "tnl1":
        # predicted-row histories (overwritten with cotangent rows)
        out_specs += [pl.BlockSpec(memory_space=pl.ANY)] * 2
        out_shape += [jax.ShapeDtypeStruct((ns, n_ck, KC, nx128),
                                           jnp.float32)] * 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(ns,),
        in_specs=[spec] * 6 + [pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=tuple(out_specs),
        scratch_shapes=[fld() for _ in range(10)] + [
            pltpu.VMEM((KC, nz8, nx128), jnp.float32),  # c_t1
            pltpu.VMEM((KC, nz8, nx128), jnp.float32),  # c_t2
            pltpu.VMEM((KC, nz8, nx128), jnp.float32),  # c_a
            pltpu.VMEM((KC, nz8, nx128), jnp.float32),  # c_b
            pltpu.VMEM((KC, nz8, nx128), jnp.float32),  # c_c
            pltpu.VMEM((KC, nx128), jnp.float32),       # rows_x
            pltpu.VMEM((KC, nx128), jnp.float32),       # rows_z
            pltpu.VMEM((KC, nx128), jnp.float32),       # obx
            pltpu.VMEM((KC, nx128), jnp.float32),       # obz
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(src_z_p, src_x_p, rcv_row, wav, rcv_cols,
      *meds, damp, obs_rows_x, obs_rows_z)
    loss_blk, glam, gl2m, gmuxz, gbx, gbz = out[:6]
    return loss_blk[0, 0], (glam, gl2m, gmuxz, gbx, gbz)


def fused_elastic_loss_grad(vp, vs, rho, wavelet, src_z, src_x, rcv_z,
                            rcv_x, cfg: ElasticConfig, obs_rows_x,
                            obs_rows_z, *, KC: int = 8,
                            misfit: str = "l2",
                            wrt=("vp", "vs"), interpret: bool = False):
    """(loss, grads dict over ``wrt``) — the drop-in DENISE gradient
    call.  Physical-field gradients come from jax.vjp of
    :func:`prep_medium` applied to the kernel's medium gradients.
    For misfit="tnl1" pass obs rows scattered from trace-normalized
    data (see :func:`fused_elastic_loss_grad_meds`)."""
    damp = prep_damp(cfg)
    meds, vjp_fn = jax.vjp(
        lambda a, b, c: prep_medium(a, b, c, cfg), vp, vs, rho)
    loss, gmeds = fused_elastic_loss_grad_meds(
        meds, damp, wavelet, src_z, src_x, rcv_z, rcv_x, cfg,
        obs_rows_x, obs_rows_z, KC=KC, misfit=misfit,
        interpret=interpret)
    gvp, gvs, grho = vjp_fn(gmeds)
    grads = {"vp": gvp, "vs": gvs, "rho": grho}
    return loss, {k: grads[k] for k in wrt}


# ---------------------------------------------------------------------------
# pure-JAX replica of the EXACT kernel scheme (test oracle)
# ---------------------------------------------------------------------------

def _ring_scan(meds, damp, cfg: ElasticConfig, wavelet, src_z, src_x,
               rcv_z, rcv_x, per_step):
    """vmap-over-shots scan of the EXACT kernel scheme (circular
    rolls + ring, identical update order).  ``per_step(vx, vz, rrow,
    cols, aux_t)`` maps each step's state to the scan output."""
    g = cfg.grid
    top, w, nzp, nxp, nz8, nx128 = _layout(cfg)
    lam, l2m, muxz, bx, bz = meds
    dtx = g.dt / g.dx
    fs_row = top if g.free_surface else -1
    row = jnp.arange(nz8)[:, None]
    fs = jnp.where(row == fs_row, 0.0, 1.0) if fs_row >= 0 else None
    C1, C2 = 9.0 / 8.0, -1.0 / 24.0

    def sx_(f, k):
        return jnp.roll(f, -k, axis=1)

    def sz_(f, k):
        return jnp.roll(f, -k, axis=0)

    def Dxf(f):
        return C1 * (sx_(f, 1) - f) + C2 * (sx_(f, 2) - sx_(f, -1))

    def Dxb(f):
        return C1 * (f - sx_(f, -1)) + C2 * (sx_(f, 1) - sx_(f, -2))

    def Dzf(f):
        return C1 * (sz_(f, 1) - f) + C2 * (sz_(f, 2) - sz_(f, -1))

    def Dzb(f):
        return C1 * (f - sz_(f, -1)) + C2 * (sz_(f, 1) - sz_(f, -2))

    if wavelet.ndim == 1:
        wavelet = jnp.broadcast_to(wavelet[None, :],
                                   (src_z.shape[0], g.nt))

    def one_shot(wav, szi, sxi, rzi, rxi, aux):
        szi = szi + top
        sxi = sxi + w
        rrow = rzi[0] + top
        cols = rxi + w
        src_gain = g.dt / (g.dx * g.dx) * l2m[szi, sxi]
        zero = jnp.zeros((nz8, nx128), jnp.float32)

        def step(carry, inp):
            amp_t, aux_t = inp
            vx, vz, sxx, szz, sxz = carry
            t1 = Dxf(sxx) + Dzb(sxz)
            vx = damp * (vx + dtx * bx * t1)
            t2 = Dxb(sxz) + Dzf(szz)
            vz = damp * (vz + dtx * bz * t2)
            a = Dxb(vx)
            b = Dzb(vz)
            amp = amp_t * src_gain
            sxx = (damp * (sxx + dtx * (l2m * a + lam * b))
                   ).at[szi, sxi].add(amp)
            szz = (damp * (szz + dtx * (lam * a + l2m * b))
                   ).at[szi, sxi].add(amp)
            if fs is not None:
                szz = szz * fs
            cc = Dxf(vz) + Dzf(vx)
            sxz = damp * (sxz + dtx * muxz * cc)
            return (vx, vz, sxx, szz, sxz), per_step(vx, vz, rrow,
                                                     cols, aux_t)

        carry = tuple(zero for _ in range(5))
        _, outs = jax.lax.scan(step, carry, (wav, aux))
        return outs

    return one_shot


def simulate_elastic_ring(vp, vs, rho, wavelet, src_z, src_x, rcv_z,
                          rcv_x, cfg: ElasticConfig):
    """Forward traces (vx, vz), each [ns, nt, nr], with the EXACT
    operator of the fused kernel — use this to generate synthetic
    observed data so the fused misfit is zero at the true model."""
    meds = prep_medium(vp, vs, rho, cfg)
    damp = prep_damp(cfg)

    def per_step(vx, vz, rrow, cols, _):
        return vx[rrow, cols], vz[rrow, cols]

    one_shot = _ring_scan(meds, damp, cfg, wavelet, src_z, src_x,
                          rcv_z, rcv_x, per_step)
    ns = src_z.shape[0]
    if wavelet.ndim == 1:
        wavelet = jnp.broadcast_to(wavelet[None, :],
                                   (ns, cfg.grid.nt))
    aux = jnp.zeros((ns, cfg.grid.nt), jnp.float32)
    rvx, rvz = jax.vmap(one_shot)(
        wavelet, src_z.astype(jnp.int32), src_x.astype(jnp.int32),
        rcv_z.astype(jnp.int32), rcv_x.astype(jnp.int32), aux)
    return rvx, rvz


def elastic_fused_reference(meds, damp, wavelet, src_z, src_x, rcv_z,
                            rcv_x, cfg: ElasticConfig, obs_vx, obs_vz,
                            misfit: str = "l2"):
    """The kernel's loss as differentiable JAX — jax.grad of this
    w.r.t. ``meds`` is the kernel's gradient oracle.  obs_* are plain
    [ns, nt, nr] traces; for misfit="tnl1" they must be PRE-normalized
    per trace (as the kernel's obs rows are)."""
    g = cfg.grid

    if misfit == "tnl1":
        def per_step(vx, vz, rrow, cols, aux_t):
            return vx[rrow, cols], vz[rrow, cols]
    else:
        def per_step(vx, vz, rrow, cols, aux_t):
            ox_t, oz_t = aux_t
            dx_ = vx[rrow, cols] - ox_t
            dz_ = vz[rrow, cols] - oz_t
            return jnp.sum(dx_ * dx_) + jnp.sum(dz_ * dz_)

    one_shot = _ring_scan(meds, damp, cfg, wavelet, src_z, src_x,
                          rcv_z, rcv_x, per_step)
    ns = src_z.shape[0]
    if wavelet.ndim == 1:
        wavelet = jnp.broadcast_to(wavelet[None, :], (ns, g.nt))
    outs = jax.vmap(one_shot)(
        wavelet, src_z.astype(jnp.int32), src_x.astype(jnp.int32),
        rcv_z.astype(jnp.int32), rcv_x.astype(jnp.int32),
        (obs_vx, obs_vz))
    nr = obs_vx.shape[2]
    if misfit == "tnl1":
        pvx, pvz = outs
        # per-trace max normalization with the kernel's eps; jnp.max's
        # tie-distributed subgradient is exactly the kernel's star/cnt.
        # |.| uses the sign(0)=0 subgradient (_abs0) — the kernel's
        # (and torch L1Loss's) convention; lax.abs picks +1 at exactly
        # zero residuals, which injects a spurious 1/eps-scale
        # cotangent on dead (all-zero) traces
        pvx = pvx / (jnp.max(_abs0(pvx), axis=1, keepdims=True)
                     + 1e-10)
        pvz = pvz / (jnp.max(_abs0(pvz), axis=1, keepdims=True)
                     + 1e-10)
        return (jnp.sum(_abs0(pvx - obs_vx))
                + jnp.sum(_abs0(pvz - obs_vz))) / (ns * g.nt * nr)
    return jnp.sum(outs) / (ns * g.nt * nr)
