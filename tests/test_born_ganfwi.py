"""Born modeling accuracy + GAN-FWI posterior sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from physicsbasedfwi2_tpu.geo import Grid2D, ricker, surface_line
from physicsbasedfwi2_tpu.ops import AcousticConfig, simulate_acoustic
from physicsbasedfwi2_tpu.ops.born import born_acoustic
from physicsbasedfwi2_tpu.engine.ganfwi import GanFWI, well_loss, prior_loss
from physicsbasedfwi2_tpu.data import SyntheticAcousticWorkload


def test_born_linearization_accuracy():
    """Born data must match the difference of two nonlinear sims to
    first order in the perturbation."""
    grid = Grid2D(nz=40, nx=50, dx=10.0, nt=250, dt=0.002, pml_width=14)
    cfg = AcousticConfig(grid=grid, chunk=25, vmax_pml=2500.0)
    wav = ricker(10.0, grid.nt, grid.dt)
    acq = surface_line(2, 20, 50, src_depth=2, rcv_depth=2)
    geom = tuple(jnp.asarray(a) for a in
                 (acq.src_z, acq.src_x, acq.rcv_z, acq.rcv_x))
    vp = jnp.full((40, 50), 1800.0, jnp.float32)
    dvp = jnp.zeros_like(vp).at[22:28, 20:35].set(1.0)

    bg, scat = born_acoustic(vp, dvp, wav, *geom, cfg)
    eps = 2.0
    d_plus = simulate_acoustic(vp + eps * dvp, wav, *geom, cfg)
    d_minus = simulate_acoustic(vp - eps * dvp, wav, *geom, cfg)
    fd = (d_plus - d_minus) / (2 * eps)
    num = float(jnp.abs(fd - scat).max())
    den = float(jnp.abs(scat).max())
    assert num / den < 0.05, (num, den)
    # background equals the plain forward
    np.testing.assert_allclose(np.asarray(bg),
                               np.asarray(simulate_acoustic(
                                   vp, wav, *geom, cfg)), rtol=1e-5)


def test_ganfwi_sampling_reduces_loss():
    wl = SyntheticAcousticWorkload.build(
        nz=32, nx=40, nt=160, dt=0.001, num_shots=3, num_receivers=12,
        water_rows=4, chunk=20, pml_width=10)

    # "generator": smooth parameterization z -> vp around the start
    base = wl.vp_start

    def decode(z):
        # 8 coarse bumps scaled by z
        bumps = z.reshape(2, 4)
        up = jax.image.resize(bumps, (32, 40), method="bilinear")
        return jnp.clip(base + 200.0 * up, 1500.0, 4500.0)

    g = GanFWI(decode, z_dim=8, workload=wl, sampler="sgld", lr=5e-4,
               lambda_prior=1e-4)
    losses, samples = g.sample(40, burn_in=10, thin=5)
    assert np.isfinite(losses).all()
    assert min(losses[10:]) <= losses[0]
    assert samples.shape[0] >= 5


def test_well_and_prior_losses():
    m = jnp.ones((10, 12)) * 2000.0
    truth = m.at[:, 3].set(2500.0)
    wl_val = well_loss(m, truth, jnp.asarray([3]))
    assert float(wl_val) > 0
    assert float(well_loss(truth, truth, jnp.asarray([3]))) == 0.0
    assert float(prior_loss(jnp.zeros((1, 8)))) == 0.0
