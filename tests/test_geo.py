import numpy as np
import jax.numpy as jnp

from physicsbasedfwi2_tpu.geo import (
    Grid2D, cfl_dt, check_cfl, ricker, surface_line,
    marmousi_acoustic_acquisition, lowpass_filter_time,
    model_from_storage, model_to_storage,
)


def test_ricker_peak_and_mean():
    w = np.asarray(ricker(8.0, 4001, 0.001))
    # peak at t = 1/freq = 0.125 s -> sample 125
    assert abs(int(np.argmax(w)) - 125) <= 1
    assert abs(w.max() - 1.0) < 1e-5
    # Ricker has (near) zero mean (truncation leaves a small residual)
    assert abs(w.sum()) < 0.02


def test_cfl():
    assert cfl_dt(4700.0, 10.0, order=4) > 0.001  # reference workload stable
    g = Grid2D(nz=50, nx=50, dx=10.0, nt=100, dt=0.01)
    try:
        check_cfl(4700.0, g)
        assert False, "expected CFL violation"
    except ValueError:
        pass


def test_surface_line_geometry():
    acq = marmousi_acoustic_acquisition()
    assert acq.num_shots == 18
    assert acq.num_receivers == 200
    assert acq.src_x[0] == 0 and acq.src_x[-1] == 199
    sub = acq.take_shots([0, 5])
    assert sub.num_shots == 2


def test_lowpass_removes_high_freq():
    dt = 0.001
    nt = 1000  # integer cycles for both tones -> no FFT edge effects
    t = np.arange(nt) * dt
    lo = np.sin(2 * np.pi * 5 * t)
    hi = np.sin(2 * np.pi * 80 * t)
    x = jnp.asarray(lo + hi, dtype=jnp.float32)
    y = np.asarray(lowpass_filter_time(x, fc=15.0, dt=dt))
    # low component survives, high is crushed
    corr = np.corrcoef(y, lo)[0, 1]
    assert corr > 0.99
    assert np.abs(y - lo).max() < 0.1


def test_units_roundtrip():
    m = jnp.arange(12.0).reshape(3, 4) + 1.0
    s = model_to_storage(m, flip=True)
    back = model_from_storage(s, flip=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(m), rtol=1e-6)
