"""Shot-batched variant of the second-order Pallas path.

Hypothesis tested: the per-shot kernels in :mod:`pallas_scalar2`
might be VPU instruction-issue bound (each op touches only 192x256 =
48 vregs), so batching B shots per grid program ([B, nz8, nx128]
arrays) would do ~B x the work per instruction.

Measured result (v5e, Marmousi 18-shot workload): **no gain** —
329.9 ms/iteration vs 327.8 ms for the per-shot variant, with
bit-identical gradients.  The kernel is VPU/VMEM *throughput* bound,
not issue bound.  Kept because (a) it demonstrates streaming the
receiver-row history to HBM via buffered DMA (required when nt grows
beyond what a VMEM-resident [nt, nx] history allows — the per-shot
variant holds ~4 MB of history in VMEM), and (b) the batched layout
is the template for multi-source (super-shot) encoding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from physicsbasedfwi2_tpu.ops.acoustic import AcousticConfig
from physicsbasedfwi2_tpu.ops.pallas_kernels import _round_up
from physicsbasedfwi2_tpu.ops.pallas_scalar2 import _prepare2, _lap

B = 2  # shots per program


def _fwd_kernel(src_z, src_x, rcv_row, wav_sm, K_ref, dp_ref, dm_ref,
                hist_hbm, ckpt_hbm, u0, um1, rowbuf, sem,
                *, n_ck: int, KC: int, nxp: int):
    blk = pl.program_id(0)
    u0[:] = jnp.zeros_like(u0)
    um1[:] = jnp.zeros_like(um1)
    K = K_ref[:]          # [1, nz8, nx128] broadcast over B
    dp = dp_ref[:]
    dm = dm_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, nxp), 1)

    szs, sxs, rrs, gains, hots = [], [], [], [], []
    for b in range(B):
        shot = blk * B + b
        sz = src_z[shot]
        sx = src_x[shot]
        szs.append(sz)
        sxs.append(sx)
        rrs.append(rcv_row[shot])
        hot = (col == sx).astype(jnp.float32)
        hots.append(hot)
        gains.append(jnp.sum(K_ref[0, pl.ds(sz, 1), :] * hot))

    def body(t, _):
        @pl.when(jax.lax.rem(t, KC) == 0)
        def _():
            c = t // KC
            for f_i, r in enumerate((u0, um1)):
                cp = pltpu.make_async_copy(r, ckpt_hbm.at[blk, c, f_i],
                                           sem)
                cp.start()
                cp.wait()
        u1 = dp * (2.0 * u0[:] - dm * um1[:] + K * _lap3(u0[:]))
        um1[:] = u0[:]
        u0[:] = u1
        kk = jax.lax.rem(t, KC)
        for b in range(B):
            shot = blk * B + b
            amp = wav_sm[shot, t]
            u0[b, pl.ds(szs[b], 1), :] = (
                u0[b, pl.ds(szs[b], 1), :] + amp * gains[b] * hots[b])
            rowbuf[b, pl.ds(kk, 1), :] = u0[b, pl.ds(rrs[b], 1), :]

        # flush the receiver-row buffer to HBM every KC steps (keeps
        # the [B, nt, nx] history out of VMEM)
        @pl.when(kk == KC - 1)
        def _():
            t0 = pl.multiple_of(t - (KC - 1), KC)
            for b in range(B):
                cp = pltpu.make_async_copy(
                    rowbuf.at[b],
                    hist_hbm.at[blk * B + b, pl.ds(t0, KC), :], sem)
                cp.start()
                cp.wait()
        return 0

    jax.lax.fori_loop(0, n_ck * KC, body, 0)


def _lap3(f):
    """Batched Laplacian over [B, nz, nx] (rolls on the last two
    axes)."""
    def r(k, ax):
        return pltpu.roll(f, (-k) % f.shape[ax], ax)
    L1, L2, L0 = 4.0 / 3.0, -1.0 / 12.0, -5.0 / 2.0
    return (2.0 * L0 * f
            + L1 * (r(1, 2) + r(-1, 2) + r(1, 1) + r(-1, 1))
            + L2 * (r(2, 2) + r(-2, 2) + r(2, 1) + r(-2, 1)))


def _bwd_kernel(src_z, src_x, rcv_row, wav_sm, K_ref, dp_ref, dm_ref,
                ghist_hbm, ckpt_hbm, gk_out,
                u0, um1, pb, qb, gk, lap_buf, gh_buf, sem,
                *, n_ck: int, KC: int, nxp: int):
    blk = pl.program_id(0)
    K = K_ref[:]
    dp = dp_ref[:]
    dm = dm_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, nxp), 1)

    @pl.when(blk == 0)
    def _():
        gk_out[:] = jnp.zeros_like(gk_out)

    for r_ in (u0, um1, pb, qb, gk):
        r_[:] = jnp.zeros_like(r_)

    szs, sxs, rrs, gains, hots = [], [], [], [], []
    for b in range(B):
        shot = blk * B + b
        sz = src_z[shot]
        sx = src_x[shot]
        szs.append(sz)
        sxs.append(sx)
        rrs.append(rcv_row[shot])
        hot = (col == sx).astype(jnp.float32)
        hots.append(hot)
        gains.append(jnp.sum(K_ref[0, pl.ds(sz, 1), :] * hot))

    def fstep(t):
        u1 = dp * (2.0 * u0[:] - dm * um1[:] + K * _lap3(u0[:]))
        um1[:] = u0[:]
        u0[:] = u1
        for b in range(B):
            shot = blk * B + b
            amp = wav_sm[shot, t]
            u0[b, pl.ds(szs[b], 1), :] = (
                u0[b, pl.ds(szs[b], 1), :] + amp * gains[b] * hots[b])

    def chunk_body(ci, _):
        c = n_ck - 1 - ci
        t0 = c * KC
        for f_i, r_ in enumerate((u0, um1)):
            cp = pltpu.make_async_copy(ckpt_hbm.at[blk, c, f_i], r_, sem)
            cp.start()
            cp.wait()
        for b in range(B):
            gh = pltpu.make_async_copy(
                ghist_hbm.at[blk * B + b, pl.ds(t0, KC), :],
                gh_buf.at[b], sem)
            gh.start()
            gh.wait()

        def rec_body(kk, _):
            lap_buf[pl.ds(kk, 1)] = _lap3(u0[:])[None]
            fstep(t0 + kk)
            return 0

        jax.lax.fori_loop(0, KC, rec_body, 0)

        def adj_body(kk_r, _):
            kk = KC - 1 - kk_r
            t = t0 + kk
            for b in range(B):
                shot = blk * B + b
                pb[b, pl.ds(rrs[b], 1), :] = (
                    pb[b, pl.ds(rrs[b], 1), :]
                    + gh_buf[b, pl.ds(kk, 1), :])
                amp = wav_sm[shot, t]
                gk[b, pl.ds(szs[b], 1), :] = (
                    gk[b, pl.ds(szs[b], 1), :]
                    + amp * pb[b, pl.ds(szs[b], 1), :] * hots[b])
            w = dp * pb[:]
            gk[:] = gk[:] + w * lap_buf[pl.ds(kk, 1)][0]
            ub0 = qb[:] + 2.0 * w + _lap3(K * w)
            ubm1 = -(dm * w)
            pb[:] = ub0
            qb[:] = ubm1
            return 0

        jax.lax.fori_loop(0, KC, adj_body, 0)
        return 0

    jax.lax.fori_loop(0, n_ck, chunk_body, 0)
    gk_out[:] = gk_out[:] + jnp.sum(gk[:], axis=0)


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
    return (K2d[None], dp[None], dm[None], nz8, nx128, wavelet,
            src_z_p, src_x_p, rcv_row)


def _pad_shots(arrs, ns):
    """Pad shot-indexed arrays so ns is a multiple of B."""
    target = -(-ns // B) * B
    pad = target - ns
    if pad == 0:
        return arrs, ns
    out = []
    for a in arrs:
        out.append(jnp.concatenate([a] + [a[-1:]] * pad, axis=0))
    return out, target


def forward2b(vp, wavelet, src_z, src_x, rcv_z, rcv_x,
              cfg: AcousticConfig, *, KC: int = 16):
    g = cfg.grid
    ns = int(src_z.shape[0])
    n_ck = -(-g.nt // KC)
    nt_pad = n_ck * KC
    (K3, dp3, dm3, nz8, nx128, wav, src_z_p, src_x_p,
     rcv_row) = _common(vp, wavelet, src_z, src_x, rcv_z, cfg)
    (wav, src_z_p, src_x_p, rcv_row), ns_p = _pad_shots(
        [wav, src_z_p, src_x_p, rcv_row], ns)
    wav = jnp.pad(wav, ((0, 0), (0, nt_pad - g.nt)))
    nblk = ns_p // B
    kern = functools.partial(_fwd_kernel, n_ck=n_ck, KC=KC, nxp=nx128)
    spec3 = pl.BlockSpec((1, nz8, nx128), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nblk,),
        in_specs=[spec3, spec3, spec3],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),   # hist (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # ckpt (HBM)
        ),
        scratch_shapes=[
            pltpu.VMEM((B, nz8, nx128), jnp.float32),
            pltpu.VMEM((B, nz8, nx128), jnp.float32),
            pltpu.VMEM((B, KC, nx128), jnp.float32),  # rowbuf
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    hist, ckpt = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((ns_p, nt_pad, nx128), jnp.float32),
            jax.ShapeDtypeStruct((nblk, n_ck, 2, B, nz8, nx128),
                                 jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(src_z_p, src_x_p, rcv_row, wav, K3, dp3, dm3)
    cols = (rcv_x + g.pml_width).astype(jnp.int32)
    recs = jnp.take_along_axis(hist[:ns, : g.nt], cols[:, None, :],
                               axis=2)
    return recs, ckpt


def _backward2b(vp, wavelet, src_z, src_x, rcv_z, rcv_x, cfg,
                ybar_rows, ckpt, *, KC: int = 16):
    g = cfg.grid
    ns = int(src_z.shape[0])
    n_ck = -(-g.nt // KC)
    nt_pad = n_ck * KC
    (K3, dp3, dm3, nz8, nx128, wav, src_z_p, src_x_p,
     rcv_row) = _common(vp, wavelet, src_z, src_x, rcv_z, cfg)
    (wav, src_z_p, src_x_p, rcv_row), ns_p = _pad_shots(
        [wav, src_z_p, src_x_p, rcv_row], ns)
    wav = jnp.pad(wav, ((0, 0), (0, nt_pad - g.nt)))
    if ybar_rows.shape[0] < ns_p:
        ybar_rows = jnp.pad(
            ybar_rows, ((0, ns_p - ybar_rows.shape[0]), (0, 0), (0, 0)))
    nblk = ns_p // B
    kern = functools.partial(_bwd_kernel, n_ck=n_ck, KC=KC, nxp=nx128)
    spec3 = pl.BlockSpec((1, nz8, nx128), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nblk,),
        in_specs=[spec3, spec3, spec3,
                  pl.BlockSpec(memory_space=pl.ANY),   # ghist
                  pl.BlockSpec(memory_space=pl.ANY)],  # ckpt
        out_specs=pl.BlockSpec((nz8, nx128), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, nz8, nx128), jnp.float32),  # u0
            pltpu.VMEM((B, nz8, nx128), jnp.float32),  # um1
            pltpu.VMEM((B, nz8, nx128), jnp.float32),  # pb
            pltpu.VMEM((B, nz8, nx128), jnp.float32),  # qb
            pltpu.VMEM((B, nz8, nx128), jnp.float32),  # gk
            pltpu.VMEM((KC, B, nz8, nx128), jnp.float32),  # lap cache
            pltpu.VMEM((B, KC, nx128), jnp.float32),       # ghist chunk
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    gk = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nz8, nx128), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(src_z_p, src_x_p, rcv_row, wav, K3, dp3, dm3, ybar_rows, ckpt)

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
def acoustic_pallas2b(vp, wavelet, src_z, src_x, rcv_z, rcv_x,
                      cfg: AcousticConfig):
    """Shot-batched second-order Pallas propagator (fastest path)."""
    return forward2b(vp, wavelet, src_z, src_x, rcv_z, rcv_x, cfg)[0]


def _fwd(vp, wavelet, src_z, src_x, rcv_z, rcv_x, cfg):
    recs, ckpt = forward2b(vp, wavelet, src_z, src_x, rcv_z, rcv_x, cfg)
    return recs, (vp, wavelet, src_z, src_x, rcv_z, rcv_x, ckpt)


def _int_cot(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def _bwd(cfg, res, ybar):
    vp, wavelet, src_z, src_x, rcv_z, rcv_x, ckpt = res
    g = cfg.grid
    ns = int(src_z.shape[0])
    KC = 16
    nt_pad = -(-g.nt // KC) * KC
    nx128 = _round_up(g.nx + 2 * g.pml_width, 128)
    cols = (rcv_x + g.pml_width).astype(jnp.int32)
    rows = jnp.zeros((ns, nt_pad, nx128), jnp.float32)
    si = jnp.arange(ns)[:, None, None]
    ti = jnp.arange(g.nt)[None, :, None]
    rows = rows.at[si, ti, cols[:, None, :]].add(ybar)
    gvp = _backward2b(vp, wavelet, src_z, src_x, rcv_z, rcv_x, cfg,
                      rows, ckpt)
    return (gvp, jnp.zeros_like(wavelet), _int_cot(src_z),
            _int_cot(src_x), _int_cot(rcv_z), _int_cot(rcv_x))


acoustic_pallas2b.defvjp(_fwd, _bwd)
