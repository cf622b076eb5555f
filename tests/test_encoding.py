"""Simultaneous-source encoding: linearity and gradient direction."""

import jax
import jax.numpy as jnp
import numpy as np

from physicsbasedfwi2_tpu.geo import Grid2D, ricker, surface_line
from physicsbasedfwi2_tpu.ops import (
    AcousticConfig, simulate_acoustic, acoustic_gradient, l2_misfit,
)
from physicsbasedfwi2_tpu.ops.encoding import (
    encode_shots, simulate_acoustic_encoded, encoded_fwi_gradient,
)


def setup(ns=6):
    grid = Grid2D(nz=36, nx=48, dx=10.0, nt=200, dt=0.002, pml_width=12)
    cfg = AcousticConfig(grid=grid, chunk=25, vmax_pml=2500.0)
    wav = ricker(10.0, grid.nt, grid.dt)
    acq = surface_line(ns, 16, 48, src_depth=2, rcv_depth=2)
    geom = tuple(jnp.asarray(a) for a in
                 (acq.src_z, acq.src_x, acq.rcv_z, acq.rcv_x))
    vp = jnp.full((36, 48), 1800.0, jnp.float32)
    return cfg, wav, vp, geom


def test_encoded_simulation_is_linear_combination():
    """A super-shot equals the polarity-weighted sum of its member
    shots (linearity of the wave equation in the source)."""
    cfg, wav, vp, geom = setup(ns=4)
    src_z, src_x, rcv_z, rcv_x = geom
    per_shot = simulate_acoustic(vp, wav, *geom, cfg)
    groups, pol = encode_shots(4, jax.random.PRNGKey(0), n_super=2)
    enc = simulate_acoustic_encoded(
        vp, wav, src_z[groups], src_x[groups], pol,
        jnp.broadcast_to(rcv_z[:1], (2,) + rcv_z.shape[1:]),
        jnp.broadcast_to(rcv_x[:1], (2,) + rcv_x.shape[1:]), cfg)
    expect = jnp.einsum("gk,gktr->gtr", pol, per_shot[groups])
    np.testing.assert_allclose(np.asarray(enc), np.asarray(expect),
                               rtol=2e-3, atol=1e-4)


def test_encoded_gradient_correlates_with_full():
    """Encoded gradient points (statistically) in the full-gradient
    direction."""
    cfg, wav, vp, geom = setup(ns=6)
    vpt = vp.at[18:28, 15:35].add(150.0)
    obs = simulate_acoustic(vpt, wav, *geom, cfg)

    _, g_full = acoustic_gradient(
        vp, lambda p: l2_misfit(p, obs), wav, *geom, cfg)

    gs = []
    for seed in range(4):
        _, g_enc = encoded_fwi_gradient(
            vp, obs, wav, *geom, cfg, jax.random.PRNGKey(seed),
            n_super=2)
        gs.append(np.asarray(g_enc, np.float64))
    g_avg = np.mean(gs, axis=0)
    g_full = np.asarray(g_full, np.float64)
    corr = np.corrcoef(g_avg.ravel(), g_full.ravel())[0, 1]
    assert corr > 0.8, corr
