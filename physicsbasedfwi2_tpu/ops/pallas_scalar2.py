"""Pallas fast path v2: second-order-form scalar wave equation.

Halves the state (u_cur, u_prev vs 4 split fields) and the per-step
work (one 4th-order Laplacian vs four staggered first derivatives) of
:mod:`pallas_kernels`, at the cost of a Kosloff sponge absorber
instead of split-field PML (absorption validated by test; deepwave
v0's scalar propagator — the reference's engine — used the same
second-order form).

Scheme (K = vp^2 dt^2 / dx^2, sigma = sponge profile, d+ =
1/(1+sigma dt/2), d- = 1-sigma dt/2):

    u1 = d+ * (2 u0 - d- u_m1 + K Lap(u0)) + e_src * amp * K[src]
    y_t = u1[rrow]

Exact transpose (Lap is symmetric under circular rolls; d+, d-, K
diagonal):  with (pb, qb) = cotangent of (u1, u0_out):

    pb += S^T ybar_t
    Kbar += (d+ pb) . Lap(u0)   [+ source-gain term at the src cell]
    ub0  = qb + 2 d+ pb + Lap(K d+ pb)
    ubm1 = -(d- d+ pb)
    next (pb, qb) = (ub0, ubm1)

Memory: checkpoints store (u0, u_m1) every K steps; the reverse sweep
recomputes each chunk caching Lap(u0) per step (1 field/step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from physicsbasedfwi2_tpu.ops import pml
from physicsbasedfwi2_tpu.ops.acoustic import AcousticConfig, _pad_model
from physicsbasedfwi2_tpu.ops.pallas_kernels import _round_up

# 4th-order Laplacian coefficients (per axis): [-1/12, 4/3, -5/2, 4/3, -1/12]
_L1 = 4.0 / 3.0
_L2 = -1.0 / 12.0
_L0 = -5.0 / 2.0


def _roll(f, k, ax):
    return pltpu.roll(f, (-k) % f.shape[ax], ax)


def _lap(f):
    """4th-order 5-point-per-axis Laplacian (grid units, /dx^2 folded
    into K)."""
    return (2.0 * _L0 * f
            + _L1 * (_roll(f, 1, 1) + _roll(f, -1, 1)
                     + _roll(f, 1, 0) + _roll(f, -1, 0))
            + _L2 * (_roll(f, 2, 1) + _roll(f, -2, 1)
                     + _roll(f, 2, 0) + _roll(f, -2, 0)))


def _prepare2(vp, cfg: AcousticConfig):
    g = cfg.grid
    vp_pad = _pad_model(vp.astype(jnp.float32), g)
    nzp, nxp = vp_pad.shape
    nz8 = _round_up(nzp, 8)
    nx128 = _round_up(nxp, 128)
    K = (vp_pad * g.dt / g.dx) ** 2
    K = jnp.pad(K, ((0, nz8 - nzp), (0, nx128 - nxp)), mode="edge")
    # sponge profile: sigma_x + sigma_z (Kosloff absorber), scaled
    # down vs the PML formula (sponges over-reflect if too strong)
    top = 0 if g.free_surface else g.pml_width
    w = g.pml_width
    sx = pml.sigma_profile(nxp, w, w, g.dx, cfg.vmax_pml) * 0.5
    sz = pml.sigma_profile(nzp, top, w, g.dx, cfg.vmax_pml) * 0.5
    sig = sz[:, None] + sx[None, :]
    sig = jnp.pad(sig, ((0, nz8 - nzp), (0, nx128 - nxp)), mode="edge")
    d_plus = 1.0 / (1.0 + 0.5 * g.dt * sig)
    d_minus = 1.0 - 0.5 * g.dt * sig
    # zero ring (2 cells) so circular rolls read zeros
    rows = np.zeros((nz8, 1), np.float32)
    rows[2 : nzp - 2] = 1.0
    cols = np.zeros((1, nx128), np.float32)
    cols[0, 2 : nxp - 2] = 1.0
    ring = jnp.asarray(rows * cols)
    d_plus = d_plus * ring
    return K, d_plus, d_minus, (nz8, nx128)


def _fwd_kernel(src_z, src_x, rcv_row, wav_sm, K_ref, dp_ref, dm_ref,
                hist_ref, u0, um1, *, nt: int, nxp: int, inv_dx2: float):
    shot = pl.program_id(0)
    sz = src_z[shot]
    sx = src_x[shot]
    rrow = rcv_row[shot]
    u0[:] = jnp.zeros_like(u0)
    um1[:] = jnp.zeros_like(um1)
    K = K_ref[:]
    dp = dp_ref[:]
    dm = dm_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, nxp), 1)
    src_onehot = (col == sx).astype(jnp.float32)
    src_gain = jnp.sum(K_ref[pl.ds(sz, 1), :] * src_onehot) * inv_dx2

    def body(t, _):
        u1 = dp * (2.0 * u0[:] - dm * um1[:] + K * _lap(u0[:]))
        um1[:] = u0[:]
        u0[:] = u1
        amp = wav_sm[shot, t]
        u0[pl.ds(sz, 1), :] = (u0[pl.ds(sz, 1), :]
                               + amp * src_gain * src_onehot)
        hist_ref[0, pl.ds(t, 1), :] = u0[pl.ds(rrow, 1), :]
        return 0

    jax.lax.fori_loop(0, nt, body, 0)


def _fwd_ckpt_kernel(src_z, src_x, rcv_row, wav_sm, K_ref, dp_ref, dm_ref,
                     hist_ref, ckpt_hbm, u0, um1, sem,
                     *, n_ck: int, KC: int, nxp: int, inv_dx2: float):
    """Forward that also checkpoints (u0, um1) every KC steps — used
    as the primal of the custom_vjp so the backward kernel can skip
    its own forward sweep entirely."""
    shot = pl.program_id(0)
    sz = src_z[shot]
    sx = src_x[shot]
    rrow = rcv_row[shot]
    u0[:] = jnp.zeros_like(u0)
    um1[:] = jnp.zeros_like(um1)
    K = K_ref[:]
    dp = dp_ref[:]
    dm = dm_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, nxp), 1)
    src_onehot = (col == sx).astype(jnp.float32)
    src_gain = jnp.sum(K_ref[pl.ds(sz, 1), :] * src_onehot) * inv_dx2

    def body(t, _):
        @pl.when(jax.lax.rem(t, KC) == 0)
        def _():
            c = t // KC
            for f_i, r in enumerate((u0, um1)):
                cp = pltpu.make_async_copy(r, ckpt_hbm.at[shot, c, f_i], sem)
                cp.start()
                cp.wait()
        u1 = dp * (2.0 * u0[:] - dm * um1[:] + K * _lap(u0[:]))
        um1[:] = u0[:]
        u0[:] = u1
        amp = wav_sm[shot, t]
        u0[pl.ds(sz, 1), :] = (u0[pl.ds(sz, 1), :]
                               + amp * src_gain * src_onehot)
        hist_ref[0, pl.ds(t, 1), :] = u0[pl.ds(rrow, 1), :]
        return 0

    jax.lax.fori_loop(0, n_ck * KC, body, 0)


def _bwd_kernel(src_z, src_x, rcv_row, wav_sm, K_ref, dp_ref, dm_ref,
                ghist_hbm, ckpt_hbm, gk_out,
                u0, um1, pb, qb, gk, lap_buf, gh_buf, sem,
                *, n_ck: int, KC: int, nxp: int, inv_dx2: float):
    shot = pl.program_id(0)
    sz = src_z[shot]
    sx = src_x[shot]
    rrow = rcv_row[shot]
    K = K_ref[:]
    dp = dp_ref[:]
    dm = dm_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, nxp), 1)
    src_onehot = (col == sx).astype(jnp.float32)

    @pl.when(shot == 0)
    def _():
        gk_out[:] = jnp.zeros_like(gk_out)

    for r in (u0, um1, pb, qb, gk):
        r[:] = jnp.zeros_like(r)

    src_gain = jnp.sum(K_ref[pl.ds(sz, 1), :] * src_onehot) * inv_dx2

    def fstep(t):
        u1 = dp * (2.0 * u0[:] - dm * um1[:] + K * _lap(u0[:]))
        um1[:] = u0[:]
        u0[:] = u1
        amp = wav_sm[shot, t]
        u0[pl.ds(sz, 1), :] = (u0[pl.ds(sz, 1), :]
                               + amp * src_gain * src_onehot)

    # reverse sweep straight from the primal's checkpoints
    def chunk_body(ci, _):
        c = n_ck - 1 - ci
        t0 = c * KC
        for f_i, r in enumerate((u0, um1)):
            cp = pltpu.make_async_copy(ckpt_hbm.at[shot, c, f_i], r, sem)
            cp.start()
            cp.wait()
        gh = pltpu.make_async_copy(
            ghist_hbm.at[shot, pl.ds(t0, KC), :], gh_buf, sem)
        gh.start()
        gh.wait()

        def rec_body(kk, _):
            # one Laplacian serves both the cache and the recompute
            # step (fstep would compute the identical _lap(u0) again)
            t = t0 + kk
            lapv = _lap(u0[:])
            lap_buf[pl.ds(kk, 1), :, :] = lapv[None]
            u1 = dp * (2.0 * u0[:] - dm * um1[:] + K * lapv)
            um1[:] = u0[:]
            u0[:] = u1
            amp = wav_sm[shot, t]
            u0[pl.ds(sz, 1), :] = (u0[pl.ds(sz, 1), :]
                                   + amp * src_gain * src_onehot)
            return 0

        jax.lax.fori_loop(0, KC, rec_body, 0)

        def adj_body(kk_r, _):
            kk = KC - 1 - kk_r
            t = t0 + kk
            # receiver cotangent into pb (u1 cotangent)
            pb[pl.ds(rrow, 1), :] = (pb[pl.ds(rrow, 1), :]
                                     + gh_buf[pl.ds(kk, 1), :])
            w = dp * pb[:]
            # source-gain: amp * K[src] * inv_dx2 added AFTER dp — its
            # cotangent is pb (not w) at the src cell
            amp = wav_sm[shot, t]
            gk[pl.ds(sz, 1), :] = (gk[pl.ds(sz, 1), :]
                                   + (amp * inv_dx2)
                                   * pb[pl.ds(sz, 1), :] * src_onehot)
            gk[:] = gk[:] + w * lap_buf[pl.ds(kk, 1)][0]
            ub0 = qb[:] + 2.0 * w + _lap(K * w)
            ubm1 = -(dm * w)
            pb[:] = ub0
            qb[:] = ubm1
            return 0

        jax.lax.fori_loop(0, KC, adj_body, 0)
        return 0

    jax.lax.fori_loop(0, n_ck, chunk_body, 0)
    gk_out[:] = gk_out[:] + gk[:]


def _common(vp, wavelet, src_z, src_x, rcv_z, cfg):
    g = cfg.grid
    ns = int(src_z.shape[0])
    K2d, dp, dm, (nz8, nx128) = _prepare2(vp, cfg)
    top, w = g.top_pad, g.pml_width
    if wavelet.ndim == 1:
        wavelet = jnp.broadcast_to(wavelet[None, :], (ns, g.nt))
    wavelet = wavelet.astype(jnp.float32)
    src_z_p = (src_z + top).astype(jnp.int32)
    src_x_p = (src_x + w).astype(jnp.int32)
    rcv_row = (rcv_z[:, 0] + top).astype(jnp.int32)
    return K2d, dp, dm, nz8, nx128, wavelet, src_z_p, src_x_p, rcv_row


def _vmem_spec(nz8, nx128):
    return pl.BlockSpec((nz8, nx128), lambda i, *_: (0, 0),
                        memory_space=pltpu.VMEM)


def forward2(vp, wavelet, src_z, src_x, rcv_z, rcv_x,
             cfg: AcousticConfig, *, return_rows: bool = False,
             interpret: bool = False):
    """Second-order-scheme forward.  With ``return_rows`` the full
    receiver-row history [ns, nt, nx128] is returned instead of the
    gathered traces — the layout the fused kernel's dir_rows/obs_rows
    operands use (so direct-wave rows come from the SAME operator as
    the fused prediction)."""
    g = cfg.grid
    ns = int(src_z.shape[0])
    (K2d, dp, dm, nz8, nx128, wav, src_z_p, src_x_p,
     rcv_row) = _common(vp, wavelet, src_z, src_x, rcv_z, cfg)
    kern = functools.partial(_fwd_kernel, nt=g.nt, nxp=nx128,
                             inv_dx2=1.0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ns,),
        in_specs=[_vmem_spec(nz8, nx128)] * 3,
        out_specs=pl.BlockSpec((1, g.nt, nx128), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nz8, nx128), jnp.float32),
            pltpu.VMEM((nz8, nx128), jnp.float32),
        ],
    )
    hist = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ns, g.nt, nx128), jnp.float32),
        interpret=interpret,
    )(src_z_p, src_x_p, rcv_row, wav, K2d, dp, dm)
    if return_rows:
        return hist
    cols = (rcv_x + g.pml_width).astype(jnp.int32)
    return jnp.take_along_axis(hist, cols[:, None, :], axis=2)


def forward2_ckpt(vp, wavelet, src_z, src_x, rcv_z, rcv_x,
                  cfg: AcousticConfig, *, KC: int = 32):
    """Forward that also returns the checkpoint buffer for the
    backward pass."""
    g = cfg.grid
    ns = int(src_z.shape[0])
    n_ck = -(-g.nt // KC)
    nt_pad = n_ck * KC
    (K2d, dp, dm, nz8, nx128, wav, src_z_p, src_x_p,
     rcv_row) = _common(vp, wavelet, src_z, src_x, rcv_z, cfg)
    wav = jnp.pad(wav, ((0, 0), (0, nt_pad - g.nt)))
    kern = functools.partial(_fwd_ckpt_kernel, n_ck=n_ck, KC=KC,
                             nxp=nx128, inv_dx2=1.0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ns,),
        in_specs=[_vmem_spec(nz8, nx128)] * 3,
        out_specs=(
            pl.BlockSpec((1, nt_pad, nx128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((nz8, nx128), jnp.float32),
            pltpu.VMEM((nz8, nx128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    hist, ckpt = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((ns, nt_pad, nx128), jnp.float32),
            jax.ShapeDtypeStruct((ns, n_ck, 2, nz8, nx128), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(src_z_p, src_x_p, rcv_row, wav, K2d, dp, dm)
    cols = (rcv_x + g.pml_width).astype(jnp.int32)
    recs = jnp.take_along_axis(hist[:, : g.nt], cols[:, None, :], axis=2)
    return recs, ckpt


def _backward2(vp, wavelet, src_z, src_x, rcv_z, rcv_x, cfg, ybar_rows,
               ckpt):
    g = cfg.grid
    ns = int(src_z.shape[0])
    KC = 32
    n_ck = -(-g.nt // KC)
    nt_pad = n_ck * KC
    (K2d, dp, dm, nz8, nx128, wav, src_z_p, src_x_p,
     rcv_row) = _common(vp, wavelet, src_z, src_x, rcv_z, cfg)
    wav = jnp.pad(wav, ((0, 0), (0, nt_pad - g.nt)))
    kern = functools.partial(_bwd_kernel, n_ck=n_ck, KC=KC, nxp=nx128,
                             inv_dx2=1.0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ns,),
        in_specs=[_vmem_spec(nz8, nx128)] * 3 + [
            pl.BlockSpec(memory_space=pl.ANY),   # ghist
            pl.BlockSpec(memory_space=pl.ANY),   # ckpt
        ],
        out_specs=_vmem_spec(nz8, nx128),
        scratch_shapes=[
            pltpu.VMEM((nz8, nx128), jnp.float32),  # u0
            pltpu.VMEM((nz8, nx128), jnp.float32),  # um1
            pltpu.VMEM((nz8, nx128), jnp.float32),  # pb
            pltpu.VMEM((nz8, nx128), jnp.float32),  # qb
            pltpu.VMEM((nz8, nx128), jnp.float32),  # gk
            pltpu.VMEM((KC, nz8, nx128), jnp.float32),  # lap cache
            pltpu.VMEM((KC, nx128), jnp.float32),       # ghist chunk
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    gk = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nz8, nx128), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(src_z_p, src_x_p, rcv_row, wav, K2d, dp, dm, ybar_rows, ckpt)

    # chain rule K = (vp*dt/dx)^2 -> dK/dvp = 2*vp*(dt/dx)^2, then
    # transpose the edge-pad
    top, w = g.top_pad, g.pml_width
    vp_pad = jnp.pad(vp.astype(jnp.float32), ((top, w), (w, w)),
                     mode="edge")
    nzp, nxp_r = vp_pad.shape
    gvp_pad = gk[:nzp, :nxp_r] * (2.0 * vp_pad * (g.dt / g.dx) ** 2)
    gz = gvp_pad
    row_top = jnp.sum(gz[:top, :], axis=0) if top else 0.0
    row_bot = jnp.sum(gz[top + g.nz :, :], axis=0)
    gz = gz[top : top + g.nz, :]
    gz = gz.at[0, :].add(row_top)
    gz = gz.at[-1, :].add(row_bot)
    col_l = jnp.sum(gz[:, :w], axis=1)
    col_r = jnp.sum(gz[:, w + g.nx :], axis=1)
    gz = gz[:, w : w + g.nx]
    gz = gz.at[:, 0].add(col_l)
    gz = gz.at[:, -1].add(col_r)
    return gz


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def acoustic_pallas2(vp, wavelet, src_z, src_x, rcv_z, rcv_x,
                     cfg: AcousticConfig):
    """Differentiable second-order-form Pallas propagator (fastest
    path; gradient w.r.t. vp)."""
    return forward2(vp, wavelet, src_z, src_x, rcv_z, rcv_x, cfg)


def _fwd(vp, wavelet, src_z, src_x, rcv_z, rcv_x, cfg):
    recs, ckpt = forward2_ckpt(vp, wavelet, src_z, src_x, rcv_z, rcv_x,
                               cfg)
    return recs, (vp, wavelet, src_z, src_x, rcv_z, rcv_x, ckpt)


def _int_cot(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def _bwd(cfg, res, ybar):
    vp, wavelet, src_z, src_x, rcv_z, rcv_x, ckpt = res
    g = cfg.grid
    ns = int(src_z.shape[0])
    KC = 32
    nt_pad = -(-g.nt // KC) * KC
    nx128 = _round_up(g.nx + 2 * g.pml_width, 128)
    cols = (rcv_x + g.pml_width).astype(jnp.int32)
    rows = jnp.zeros((ns, nt_pad, nx128), jnp.float32)
    si = jnp.arange(ns)[:, None, None]
    ti = jnp.arange(g.nt)[None, :, None]
    rows = rows.at[si, ti, cols[:, None, :]].add(ybar)
    gvp = _backward2(vp, wavelet, src_z, src_x, rcv_z, rcv_x, cfg, rows,
                     ckpt)
    return (gvp, jnp.zeros_like(wavelet), _int_cot(src_z),
            _int_cot(src_x), _int_cot(rcv_z), _int_cot(rcv_x))


acoustic_pallas2.defvjp(_fwd, _bwd)
