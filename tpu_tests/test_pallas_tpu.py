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


def test_fused_wavelet_gradient_fd():
    """want_wavelet_grad path of the fused kernel (the AutoWav
    source-side gradient, VERDICT r1 #4): the HARDWARE-compiled
    dJ/dwavelet must match interpret mode exactly.

    A raw FD check is ill-posed at this shape: the loss is kinked
    (L1 signs + per-trace-max argmax) so large eps crosses
    subgradient jumps, while small eps drowns in f32
    trajectory-rounding noise (measured: no eps in [3e-6, 1e-3]
    converges here).  The converged small-shape FD check lives in
    tests/test_acoustic.py::test_fused_wavelet_gradient_fd_interpret;
    this test pins hardware == reference math."""
    from physicsbasedfwi2_tpu.ops.pallas_scalar2 import forward2
    from physicsbasedfwi2_tpu.ops.pallas_fwi_fused import (
        fwi_l1_loss_grad, scatter_rows)
    from physicsbasedfwi2_tpu.ops import trace_normalize

    cfg, wav, vp, geom = setup(nz=48, nx=64, nt=320)
    g = cfg.grid
    vpt = vp.at[20:30, 25:45].add(200.0)
    obs = forward2(vpt, wav, *geom, cfg)
    obs_norm = trace_normalize(obs)
    obs_rows = scatter_rows(obs_norm, geom[3], nt=g.nt, nx=g.nx,
                            pml_width=g.pml_width)
    dir_rows = jnp.zeros_like(obs_rows)
    ns = geom[0].shape[0]
    wav2 = jnp.broadcast_to(wav[None, :], (ns, g.nt))

    def loss_of_wav(w_):
        return fwi_l1_loss_grad(vp, w_, *geom, cfg, obs_rows,
                                dir_rows)[0]

    loss, gvp, gwav = fwi_l1_loss_grad(
        vp, wav2, *geom, cfg, obs_rows, dir_rows,
        want_wavelet_grad=True)
    assert gwav.shape == (ns, g.nt)
    rng = np.random.default_rng(0)
    d = rng.standard_normal((ns, g.nt))
    for _ in range(2):
        d[:, 1:-1] = 0.25 * (d[:, 2:] + d[:, :-2]) + 0.5 * d[:, 1:-1]
    d = jnp.asarray(d / np.abs(d).max(), jnp.float32)
    loss_i, gvp_i, gwav_i = fwi_l1_loss_grad(
        vp, wav2, *geom, cfg, obs_rows, dir_rows,
        want_wavelet_grad=True, interpret=True)
    np.testing.assert_allclose(float(loss), float(loss_i), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gvp), np.asarray(gvp_i),
                               rtol=1e-5, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gwav), np.asarray(gwav_i),
                               rtol=1e-5, atol=1e-12)
    # directional sanity only (sign + order of magnitude is all FD
    # can certify at this shape)
    ad = float(jnp.vdot(gwav, d))
    assert np.isfinite(ad) and abs(ad) > 0


def test_fused_elastic_kernel_tpu_parity():
    """Fused elastic loss+grad kernel compiled on hardware vs the
    exact-scheme JAX replica."""
    from physicsbasedfwi2_tpu.geo import Grid2D, ricker
    from physicsbasedfwi2_tpu.ops.elastic import ElasticConfig
    from physicsbasedfwi2_tpu.ops.pallas_elastic_fused import (
        prep_medium, prep_damp, scatter_rows_el,
        fused_elastic_loss_grad_meds, elastic_fused_reference,
        simulate_elastic_ring)
    from physicsbasedfwi2_tpu.data.synthetic import (
        make_marmousi_like, make_elastic_model)

    nz, nx, nt = 48, 64, 128
    grid = Grid2D(nz=nz, nx=nx, dx=15.0, nt=nt, dt=0.0015,
                  pml_width=12, free_surface=True)
    cfg = ElasticConfig(grid=grid, chunk=16, vmax_pml=4000.0)
    vp = make_marmousi_like(nz, nx, seed=0, water_rows=5)
    vp_t, vs_t, rho_t = make_elastic_model(vp, water_rows=5)
    wav = ricker(12.0, nt, 0.0015)
    ns, nr = 2, 16
    sz = jnp.asarray([6, 6])
    sx = jnp.asarray([12, 40])
    rz = jnp.full((ns, nr), 6, jnp.int32)
    rx = jnp.tile(jnp.asarray(np.linspace(3, nx - 4, nr,
                                          dtype=np.int32)), (ns, 1))
    ovx, ovz = simulate_elastic_ring(
        jnp.asarray(vp_t), jnp.asarray(vs_t), jnp.asarray(rho_t),
        wav, sz, sx, rz, rx, cfg)
    vp_s = jnp.asarray(vp_t) * 0.95
    meds, _ = jax.vjp(lambda a, b, c: prep_medium(a, b, c, cfg),
                      vp_s, jnp.asarray(vs_t), jnp.asarray(rho_t))
    damp = prep_damp(cfg)
    rl, rg = jax.value_and_grad(
        lambda m: elastic_fused_reference(m, damp, wav, sz, sx, rz,
                                          rx, cfg, ovx, ovz))(meds)
    KC = 8
    orx = scatter_rows_el(ovx, rx, cfg, KC=KC)
    orz = scatter_rows_el(ovz, rx, cfg, KC=KC)
    kl, kg = fused_elastic_loss_grad_meds(
        meds, damp, wav, sz, sx, rz, rx, cfg, orx, orz, KC=KC)
    assert abs(float(rl) - float(kl)) <= 1e-4 * abs(float(rl))
    for a, b in zip(rg, kg):
        na = float(jnp.max(jnp.abs(a)))
        assert float(jnp.max(jnp.abs(a - b))) <= 1e-4 * (na + 1e-30)


def test_fused_elastic_tnl1_tpu_parity():
    """tnl1 fused elastic kernel compiled on hardware vs interpret
    mode: the flagship recipe's misfit must be bit-stable across the
    Mosaic compile (the tnl1 kink makes FD meaningless here — parity
    against the verified interpret path is the bar, as for the
    acoustic tnl1 kernel)."""
    from physicsbasedfwi2_tpu.geo import Grid2D, ricker
    from physicsbasedfwi2_tpu.ops.elastic import ElasticConfig
    from physicsbasedfwi2_tpu.ops.misfit import trace_normalize
    from physicsbasedfwi2_tpu.ops.pallas_elastic_fused import (
        prep_medium, prep_damp, scatter_rows_el,
        fused_elastic_loss_grad_meds, simulate_elastic_ring)
    from physicsbasedfwi2_tpu.data.synthetic import (
        make_marmousi_like, make_elastic_model)

    nz, nx, nt = 48, 64, 128
    grid = Grid2D(nz=nz, nx=nx, dx=15.0, nt=nt, dt=0.0015,
                  pml_width=12, free_surface=True)
    cfg = ElasticConfig(grid=grid, chunk=16, vmax_pml=4000.0)
    vp = make_marmousi_like(nz, nx, seed=0, water_rows=5)
    vp_t, vs_t, rho_t = make_elastic_model(vp, water_rows=5)
    wav = ricker(12.0, nt, 0.0015)
    ns, nr = 2, 16
    sz = jnp.asarray([6, 6])
    sx = jnp.asarray([12, 40])
    rz = jnp.full((ns, nr), 6, jnp.int32)
    rx = jnp.tile(jnp.asarray(np.linspace(3, nx - 4, nr,
                                          dtype=np.int32)), (ns, 1))
    ovx, ovz = simulate_elastic_ring(
        jnp.asarray(vp_t), jnp.asarray(vs_t), jnp.asarray(rho_t),
        wav, sz, sx, rz, rx, cfg)
    ovx_n, ovz_n = trace_normalize(ovx), trace_normalize(ovz)
    vp_s = jnp.asarray(vp_t) * 0.95
    meds, _ = jax.vjp(lambda a, b, c: prep_medium(a, b, c, cfg),
                      vp_s, jnp.asarray(vs_t), jnp.asarray(rho_t))
    damp = prep_damp(cfg)
    KC = 8
    orx = scatter_rows_el(ovx_n, rx, cfg, KC=KC)
    orz = scatter_rows_el(ovz_n, rx, cfg, KC=KC)
    il, ig = fused_elastic_loss_grad_meds(
        meds, damp, wav, sz, sx, rz, rx, cfg, orx, orz, KC=KC,
        misfit="tnl1", interpret=True)
    kl, kg = fused_elastic_loss_grad_meds(
        meds, damp, wav, sz, sx, rz, rx, cfg, orx, orz, KC=KC,
        misfit="tnl1")
    assert abs(float(il) - float(kl)) <= 1e-5 * abs(float(il))
    for a, b in zip(ig, kg):
        na = float(jnp.max(jnp.abs(a)))
        assert float(jnp.max(jnp.abs(a - b))) <= 1e-4 * (na + 1e-30)
