"""Elastic P-SV propagator correctness (replaces DENISE, SURVEY §2.1 N2)."""

import numpy as np
import jax
import jax.numpy as jnp

from physicsbasedfwi2_tpu.geo import Grid2D, ricker
from physicsbasedfwi2_tpu.ops import simulate_elastic, elastic_gradient, ElasticConfig


def small_setup(nz=50, nx=70, nt=400, dt=0.0015, dx=10.0,
                vp0=2000.0, vs0=1200.0, rho0=2000.0, free_surface=False):
    grid = Grid2D(nz=nz, nx=nx, dx=dx, nt=nt, dt=dt, pml_width=20,
                  free_surface=free_surface)
    cfg = ElasticConfig(grid=grid, chunk=25, vmax_pml=3000.0)
    wav = ricker(12.0, nt, dt)
    src_z = jnp.array([nz // 2], jnp.int32)
    src_x = jnp.array([nx // 2], jnp.int32)
    rcv_z = jnp.array([[nz // 2]], jnp.int32)
    rcv_x = jnp.array([[nx - 15]], jnp.int32)
    vp = jnp.full((nz, nx), vp0, jnp.float32)
    vs = jnp.full((nz, nx), vs0, jnp.float32)
    rho = jnp.full((nz, nx), rho0, jnp.float32)
    return cfg, wav, (vp, vs, rho), (src_z, src_x, rcv_z, rcv_x)


def test_p_wave_travel_time():
    """Explosive source in homogeneous medium: first arrival on the
    radial (vx) component travels at vp."""
    cfg, wav, med, geom = small_setup()
    rvx, rvz = simulate_elastic(*med, wav, *geom, cfg)
    trace = np.asarray(rvx)[0, :, 0]
    dist = (70 - 15 - 35) * cfg.grid.dx  # 200 m
    t_exp = dist / 2000.0 + 1.0 / 12.0  # + wavelet delay
    it_peak = int(np.argmax(np.abs(trace)))
    t_peak = it_peak * cfg.grid.dt
    assert abs(t_peak - t_exp) < 0.02, (t_peak, t_exp)


def test_energy_absorbed():
    cfg, wav, med, geom = small_setup(nt=1400)
    rvx, _ = simulate_elastic(*med, wav, *geom, cfg)
    tr = np.asarray(rvx)[0, :, 0]
    assert np.abs(tr[1100:]).max() < 5e-2 * np.abs(tr).max()


def test_adjoint_dot_product():
    cfg, wav, med, geom = small_setup(nz=40, nx=50, nt=250)
    vp, vs, rho = med

    def fwd(vp_, vs_):
        rvx, rvz = simulate_elastic(vp_, vs_, rho, wav, *geom, cfg)
        return rvx + rvz

    key = jax.random.PRNGKey(0)
    dvp = jax.random.normal(key, vp.shape, jnp.float32)
    dvs = jax.random.normal(jax.random.PRNGKey(1), vs.shape, jnp.float32)
    dw = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.grid.nt, 1),
                           jnp.float32)
    _, jv = jax.jvp(fwd, (vp, vs), (dvp, dvs))
    _, vjp_fn = jax.vjp(fwd, vp, vs)
    jtw = vjp_fn(dw)
    lhs = float(jnp.vdot(jv, dw))
    rhs = float(jnp.vdot(dvp, jtw[0]) + jnp.vdot(dvs, jtw[1]))
    rel = abs(lhs - rhs) / (abs(lhs) + 1e-20)
    assert rel < 1e-4, (lhs, rhs, rel)


def test_gradient_directional_fd():
    cfg, wav, med, geom = small_setup(nz=40, nx=50, nt=250)
    vp, vs, rho = med
    vp_true = vp.at[20:30, 20:35].add(200.0)
    obs = simulate_elastic(vp_true, vs, rho, wav, *geom, cfg)

    def loss_fn(pred):
        rvx, rvz = pred
        ox, oz = obs
        return jnp.mean((rvx - ox) ** 2) + jnp.mean((rvz - oz) ** 2)

    _, grads = elastic_gradient(vp, vs, rho, loss_fn, wav, *geom, cfg,
                                wrt=("vp",))
    g = np.asarray(grads["vp"], np.float64)

    rng = np.random.default_rng(0)
    d = rng.standard_normal(vp.shape)
    for ax in (0, 1):
        d = 0.25 * (np.roll(d, 1, ax) + np.roll(d, -1, ax)) + 0.5 * d
    d = d / np.abs(d).max()
    dj = jnp.asarray(d, jnp.float32)
    eps = 2.0

    def scalar(v):
        return float(loss_fn(simulate_elastic(v, vs, rho, wav, *geom, cfg)))

    fd = (scalar(vp + eps * dj) - scalar(vp - eps * dj)) / (2 * eps)
    ad = float(np.vdot(g, d))
    rel = abs(fd - ad) / max(abs(fd), 1e-20)
    assert rel < 1e-3, (fd, ad, rel)


def test_free_surface_rayleigh():
    """With a free surface, a shallow source produces larger late
    ground-roll energy at a surface receiver than the absorbing-top
    run (qualitative surface-wave check)."""
    nz, nx, nt = 50, 70, 700
    for fs in (True, False):
        grid = Grid2D(nz=nz, nx=nx, dx=10.0, nt=nt, dt=0.0015,
                      pml_width=20, free_surface=fs)
        cfg = ElasticConfig(grid=grid, chunk=25, vmax_pml=3000.0)
        wav = ricker(12.0, nt, 0.0015)
        src = (jnp.array([1], jnp.int32), jnp.array([20], jnp.int32))
        rcv = (jnp.array([[1]], jnp.int32), jnp.array([[50]], jnp.int32))
        vp = jnp.full((nz, nx), 2000.0, jnp.float32)
        vs = jnp.full((nz, nx), 1200.0, jnp.float32)
        rho = jnp.full((nz, nx), 2000.0, jnp.float32)
        rvx, rvz = simulate_elastic(vp, vs, rho, wav, *src, *rcv, cfg)
        e = float(jnp.sum(rvz[0, :, 0] ** 2))
        if fs:
            e_fs = e
        else:
            e_ab = e
    assert e_fs > 1.5 * e_ab, (e_fs, e_ab)
