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


def test_fast_scheme_matches_pml_kinematics():
    """5-field sponge fast path vs the 10-field split-PML scheme:
    interior traces match to high correlation."""
    from physicsbasedfwi2_tpu.ops.elastic_fast import simulate_elastic_fast
    cfg, wav, med, geom = small_setup(nz=40, nx=60, nt=300)
    a_vx, a_vz = simulate_elastic(*med, wav, *geom, cfg)
    b_vx, b_vz = simulate_elastic_fast(*med, wav, *geom, cfg)

    def corr(a, b):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        return float(np.dot(a, b)
                     / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))

    assert corr(a_vx, b_vx) > 0.999, corr(a_vx, b_vx)
    # vz at source depth is near-zero (symmetry) and dominated by
    # edge reflections where sponge and PML legitimately differ
    assert corr(a_vz, b_vz) > 0.99, corr(a_vz, b_vz)


def test_fast_scheme_gradient_fd():
    """Directional FD vs AD on the fast path (same recipe as the PML
    test above)."""
    from physicsbasedfwi2_tpu.ops.elastic_fast import simulate_elastic_fast
    cfg, wav, med, geom = small_setup(nz=40, nx=50, nt=250)
    vp, vs, rho = med
    vp_true = vp.at[20:30, 20:35].add(200.0)
    obs = simulate_elastic_fast(vp_true, vs, rho, wav, *geom, cfg)

    def loss_v(v):
        rvx, rvz = simulate_elastic_fast(v, vs, rho, wav, *geom, cfg)
        return (jnp.mean((rvx - obs[0]) ** 2)
                + jnp.mean((rvz - obs[1]) ** 2))

    g = np.asarray(jax.grad(loss_v)(vp), np.float64)
    rng = np.random.default_rng(0)
    d = rng.standard_normal(vp.shape)
    for ax in (0, 1):
        d = 0.25 * (np.roll(d, 1, ax) + np.roll(d, -1, ax)) + 0.5 * d
    d = d / np.abs(d).max()
    dj = jnp.asarray(d, jnp.float32)
    eps = 2.0
    fd = (float(loss_v(vp + eps * dj))
          - float(loss_v(vp - eps * dj))) / (2 * eps)
    ad = float(np.vdot(g, d))
    rel = abs(fd - ad) / max(abs(fd), 1e-20)
    assert rel < 1e-3, (fd, ad, rel)


def test_fused_elastic_kernel_matches_autodiff_interpret():
    """Fused elastic loss+grad kernel (interpret mode) vs jax.grad of
    the exact-scheme JAX replica: hand-derived transpose must match
    to f32 roundoff, and the misfit must vanish at the true model
    when obs comes from the same operator."""
    from physicsbasedfwi2_tpu.ops.pallas_elastic_fused import (
        prep_medium, prep_damp, scatter_rows_el,
        fused_elastic_loss_grad_meds, fused_elastic_loss_grad,
        elastic_fused_reference, simulate_elastic_ring)
    from physicsbasedfwi2_tpu.data.synthetic import (
        make_marmousi_like, make_elastic_model)

    nz, nx, nt = 36, 48, 64
    grid = Grid2D(nz=nz, nx=nx, dx=15.0, nt=nt, dt=0.0015, pml_width=8,
                  free_surface=True)
    cfg = ElasticConfig(grid=grid, chunk=16, vmax_pml=4000.0)
    vp = make_marmousi_like(nz, nx, seed=0, water_rows=4)
    vp_t, vs_t, rho_t = make_elastic_model(vp, water_rows=4)
    wav = ricker(12.0, nt, 0.0015)
    ns, nr = 2, 10
    sz = jnp.asarray([5, 5])
    sx = jnp.asarray([10, 30])
    rz = jnp.full((ns, nr), 5, jnp.int32)
    rx = jnp.tile(jnp.asarray(np.linspace(3, nx - 4, nr,
                                          dtype=np.int32)), (ns, 1))
    ovx, ovz = simulate_elastic_ring(
        jnp.asarray(vp_t), jnp.asarray(vs_t), jnp.asarray(rho_t),
        wav, sz, sx, rz, rx, cfg)
    vp_s = jnp.asarray(vp_t) * 0.95
    meds, _ = jax.vjp(lambda a, b, c: prep_medium(a, b, c, cfg),
                      vp_s, jnp.asarray(vs_t), jnp.asarray(rho_t))
    damp = prep_damp(cfg)
    ref_loss, ref_g = jax.value_and_grad(
        lambda m: elastic_fused_reference(m, damp, wav, sz, sx, rz, rx,
                                          cfg, ovx, ovz))(meds)
    KC = 16
    orx = scatter_rows_el(ovx, rx, cfg, KC=KC)
    orz = scatter_rows_el(ovz, rx, cfg, KC=KC)
    loss, gm = fused_elastic_loss_grad_meds(
        meds, damp, wav, sz, sx, rz, rx, cfg, orx, orz, KC=KC,
        interpret=True)
    assert abs(float(ref_loss) - float(loss)) <= 1e-6 * abs(
        float(ref_loss))
    for a, b in zip(ref_g, gm):
        na = float(jnp.max(jnp.abs(a)))
        assert float(jnp.max(jnp.abs(a - b))) <= 1e-5 * (na + 1e-30)
    # physical-field chain rule + zero misfit at the truth
    loss_t, _ = fused_elastic_loss_grad(
        jnp.asarray(vp_t), jnp.asarray(vs_t), jnp.asarray(rho_t),
        wav, sz, sx, rz, rx, cfg, orx, orz, KC=KC,
        wrt=("vp", "vs", "rho"), interpret=True)
    assert float(loss_t) < 1e-14
    loss_s, grads_s = fused_elastic_loss_grad(
        vp_s, jnp.asarray(vs_t), jnp.asarray(rho_t),
        wav, sz, sx, rz, rx, cfg, orx, orz, KC=KC,
        wrt=("vp", "vs", "rho"), interpret=True)
    assert float(loss_s) > 0
    assert float(jnp.abs(grads_s["vp"]).max()) > 0


def test_fused_elastic_tnl1_matches_autodiff_interpret():
    """Fused elastic kernel with the trace-normalized-L1 misfit
    (the flagship recipe) vs jax.grad of the exact-scheme replica:
    the 4-sweep per-trace-max subgradient (ported from
    pallas_fwi_fused) must reproduce jnp.max's tie-distributed
    autodiff to f32 roundoff, and the misfit must vanish at the true
    model."""
    from physicsbasedfwi2_tpu.ops.misfit import trace_normalize
    from physicsbasedfwi2_tpu.ops.pallas_elastic_fused import (
        prep_medium, prep_damp, scatter_rows_el,
        fused_elastic_loss_grad_meds, fused_elastic_loss_grad,
        elastic_fused_reference, simulate_elastic_ring)
    from physicsbasedfwi2_tpu.data.synthetic import (
        make_marmousi_like, make_elastic_model)

    nz, nx, nt = 36, 48, 64
    grid = Grid2D(nz=nz, nx=nx, dx=15.0, nt=nt, dt=0.0015, pml_width=8,
                  free_surface=True)
    cfg = ElasticConfig(grid=grid, chunk=16, vmax_pml=4000.0)
    vp = make_marmousi_like(nz, nx, seed=0, water_rows=4)
    vp_t, vs_t, rho_t = make_elastic_model(vp, water_rows=4)
    wav = ricker(12.0, nt, 0.0015)
    ns, nr = 2, 10
    sz = jnp.asarray([5, 5])
    sx = jnp.asarray([10, 30])
    rz = jnp.full((ns, nr), 5, jnp.int32)
    rx = jnp.tile(jnp.asarray(np.linspace(3, nx - 4, nr,
                                          dtype=np.int32)), (ns, 1))
    ovx, ovz = simulate_elastic_ring(
        jnp.asarray(vp_t), jnp.asarray(vs_t), jnp.asarray(rho_t),
        wav, sz, sx, rz, rx, cfg)
    # the tnl1 kernel consumes pre-normalized observed data
    ovx_n, ovz_n = trace_normalize(ovx), trace_normalize(ovz)
    vp_s = jnp.asarray(vp_t) * 0.95
    meds, _ = jax.vjp(lambda a, b, c: prep_medium(a, b, c, cfg),
                      vp_s, jnp.asarray(vs_t), jnp.asarray(rho_t))
    damp = prep_damp(cfg)
    ref_loss, ref_g = jax.value_and_grad(
        lambda m: elastic_fused_reference(m, damp, wav, sz, sx, rz, rx,
                                          cfg, ovx_n, ovz_n,
                                          misfit="tnl1"))(meds)
    KC = 16
    orx = scatter_rows_el(ovx_n, rx, cfg, KC=KC)
    orz = scatter_rows_el(ovz_n, rx, cfg, KC=KC)
    loss, gm = fused_elastic_loss_grad_meds(
        meds, damp, wav, sz, sx, rz, rx, cfg, orx, orz, KC=KC,
        misfit="tnl1", interpret=True)
    assert abs(float(ref_loss) - float(loss)) <= 1e-6 * abs(
        float(ref_loss))
    for a, b in zip(ref_g, gm):
        na = float(jnp.max(jnp.abs(a)))
        assert float(jnp.max(jnp.abs(a - b))) <= 1e-5 * (na + 1e-30)
    # near-zero misfit at the truth (both sides normalized the same
    # way; only f32 roundoff survives)
    loss_t, _ = fused_elastic_loss_grad(
        jnp.asarray(vp_t), jnp.asarray(vs_t), jnp.asarray(rho_t),
        wav, sz, sx, rz, rx, cfg, orx, orz, KC=KC, misfit="tnl1",
        wrt=("vp", "vs", "rho"), interpret=True)
    assert float(loss_t) < 1e-9


def test_elastic_illumination_map():
    """elastic_illumination (DENISE EPRECOND's Hessian-diagonal
    proxy): interior-shaped, non-negative, peaks near the source and
    decays into the poorly illuminated deep rows."""
    from physicsbasedfwi2_tpu.ops.elastic_fast import elastic_illumination
    cfg, wav, med, geom = small_setup(nz=40, nx=56, nt=300)
    src_z = jnp.array([4], jnp.int32)
    src_x = jnp.array([28], jnp.int32)
    il = elastic_illumination(*med, wav, src_z, src_x, cfg)
    assert il.shape == (40, 56)
    il = np.asarray(il)
    assert (il >= 0).all() and il.max() > 0
    row_peak = int(np.argmax(il.max(axis=1)))
    assert row_peak <= 8, row_peak          # energy concentrates at src
    assert il[-1].max() < 0.05 * il.max()   # deep rows barely lit
