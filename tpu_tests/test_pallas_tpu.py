"""TPU-hardware tests for the Pallas fast path.

Not collected by the default CPU suite (pytest testpaths=tests);
run manually on a TPU host:

    python -m pytest tpu_tests/ -x -q
"""

import os

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".cache", "jax"))

import jax.numpy as jnp
import numpy as np
import pytest

if jax.devices()[0].platform != "tpu":
    pytest.skip("requires TPU hardware", allow_module_level=True)

from physicsbasedfwi2_tpu.geo import Grid2D, ricker, surface_line
from physicsbasedfwi2_tpu.ops import AcousticConfig, simulate_acoustic
from physicsbasedfwi2_tpu.ops.pallas_adjoint import acoustic_pallas


def setup(nz=48, nx=64, nt=480):
    grid = Grid2D(nz=nz, nx=nx, dx=10.0, nt=nt, dt=0.002, pml_width=16)
    cfg = AcousticConfig(grid=grid, chunk=16, vmax_pml=2500.0)
    wav = ricker(10.0, grid.nt, grid.dt)
    src_z = jnp.array([24], jnp.int32)
    src_x = jnp.array([8], jnp.int32)
    rcv_z = jnp.full((1, 30), 4, jnp.int32)
    rcv_x = jnp.arange(10, 40, dtype=jnp.int32)[None, :]
    vp = jnp.full((nz, nx), 1700.0, jnp.float32)
    return cfg, wav, vp, (src_z, src_x, rcv_z, rcv_x)


def test_pallas_forward_matches_xla():
    cfg, wav, vp, geom = setup()
    a = np.asarray(simulate_acoustic(vp, wav, *geom, cfg))
    b = np.asarray(acoustic_pallas(vp, wav, *geom, cfg))
    rel = np.abs(a - b).max() / np.abs(a).max()
    assert rel < 5e-3, rel


def test_pallas_gradient_matches_xla():
    cfg, wav, vp, geom = setup()
    vpt = vp.at[20:30, 25:45].add(200.0)
    obs = simulate_acoustic(vpt, wav, *geom, cfg)

    def loss_x(v):
        return jnp.mean((simulate_acoustic(v, wav, *geom, cfg) - obs) ** 2)

    def loss_p(v):
        return jnp.mean((acoustic_pallas(v, wav, *geom, cfg) - obs) ** 2)

    gx = np.asarray(jax.grad(loss_x)(vp), np.float64)
    gp = np.asarray(jax.grad(loss_p)(vp), np.float64)
    rel = np.abs(gx - gp).max() / np.abs(gx).max()
    corr = np.corrcoef(gx.ravel(), gp.ravel())[0, 1]
    assert rel < 5e-3, rel
    assert corr > 0.99999, corr


def test_pallas_multi_shot():
    cfg, wav, vp, _ = setup()
    acq = surface_line(4, 20, 64, src_depth=2, rcv_depth=2)
    geom = tuple(jnp.asarray(a) for a in
                 (acq.src_z, acq.src_x, acq.rcv_z, acq.rcv_x))
    a = np.asarray(simulate_acoustic(vp, wav, *geom, cfg))
    b = np.asarray(acoustic_pallas(vp, wav, *geom, cfg))
    assert a.shape == b.shape == (4, cfg.grid.nt, 20)
    rel = np.abs(a - b).max() / np.abs(a).max()
    assert rel < 5e-3, rel


def test_scalar2_gradient_fd():
    """Second-order-form fast path: FD directional gradient check."""
    from physicsbasedfwi2_tpu.ops.pallas_scalar2 import acoustic_pallas2
    cfg, wav, vp, geom = setup()
    vpt = vp.at[20:30, 25:45].add(200.0)
    obs = acoustic_pallas2(vpt, wav, *geom, cfg)

    def loss_p(v):
        return jnp.mean((acoustic_pallas2(v, wav, *geom, cfg) - obs) ** 2)

    gp = np.asarray(jax.grad(loss_p)(vp), np.float64)
    rng = np.random.default_rng(0)
    d = rng.standard_normal(vp.shape)
    for ax in (0, 1):
        d = 0.25 * (np.roll(d, 1, ax) + np.roll(d, -1, ax)) + 0.5 * d
    d /= np.abs(d).max()
    dj = jnp.asarray(d, jnp.float32)
    fd = (float(loss_p(vp + 2 * dj)) - float(loss_p(vp - 2 * dj))) / 4.0
    ad = float(np.vdot(gp, d))
    assert abs(fd - ad) / max(abs(fd), 1e-30) < 1e-3


def test_scalar2b_matches_scalar2():
    """Shot-batched variant: identical recs and gradients."""
    from physicsbasedfwi2_tpu.ops.pallas_scalar2 import acoustic_pallas2
    from physicsbasedfwi2_tpu.ops.pallas_scalar2b import acoustic_pallas2b
    cfg, wav, vp, _ = setup()
    acq = surface_line(3, 20, 64, src_depth=2, rcv_depth=2)
    geom = tuple(jnp.asarray(a) for a in
                 (acq.src_z, acq.src_x, acq.rcv_z, acq.rcv_x))
    a = np.asarray(acoustic_pallas2(vp, wav, *geom, cfg))
    b = np.asarray(acoustic_pallas2b(vp, wav, *geom, cfg))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_fused_loss_grad_matches_custom_vjp():
    """The fused kernel's loss and gradient equal the scalar2
    custom_vjp path on the reference misfit pipeline."""
    from physicsbasedfwi2_tpu.ops.pallas_scalar2 import acoustic_pallas2
    from physicsbasedfwi2_tpu.ops.pallas_fwi_fused import (
        fwi_l1_loss_grad, scatter_rows)
    cfg, wav, vp, _ = setup()
    acq = surface_line(3, 30, 64, src_depth=0, rcv_depth=0)
    geom = tuple(jnp.asarray(a) for a in
                 (acq.src_z, acq.src_x, acq.rcv_z, acq.rcv_x))
    vpt = vp.at[20:30, 25:45].add(200.0)
    obs = acoustic_pallas2(vpt, wav, *geom, cfg)
    m0 = jnp.max(jnp.abs(obs), axis=1, keepdims=True)
    obs_n = obs / (m0 + 1e-10)
    direct = acoustic_pallas2(jnp.full_like(vp, 1700.0), wav, *geom, cfg)

    def ref_loss(v):
        pred = acoustic_pallas2(v, wav, *geom, cfg) - direct
        mm = jnp.max(jnp.abs(pred), axis=1, keepdims=True)
        return jnp.mean(jnp.abs(pred / (mm + 1e-10) - obs_n))

    lr, gr = jax.value_and_grad(ref_loss)(vp)
    g = cfg.grid
    obs_rows = scatter_rows(obs_n, geom[3], nt=g.nt, nx=g.nx,
                            pml_width=g.pml_width)
    dir_rows = scatter_rows(direct, geom[3], nt=g.nt, nx=g.nx,
                            pml_width=g.pml_width)
    lf, gf = fwi_l1_loss_grad(vp, wav, *geom, cfg, obs_rows, dir_rows)
    assert abs(float(lr - lf)) / abs(float(lr)) < 1e-5
    gr, gf = np.asarray(gr, np.float64), np.asarray(gf, np.float64)
    assert np.abs(gr - gf).max() / np.abs(gr).max() < 1e-5
