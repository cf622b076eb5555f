"""Generator zoo: shapes, determinism, registry coverage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physicsbasedfwi2_tpu.models import (
    define_generator, define_discriminator, AutoEncoderNet,
    ElasticAutoEncoderNet, VaeNet, kl_divergence, UNet, FNO2d,
    gan_loss, LatentFlow, PlanarFlowStack, lp_loss, ImagePool,
    apply_velocity_output, apply_elastic_output,
)

KEY = jax.random.PRNGKey(0)


def test_autoencoder_shapes_and_latent():
    net = AutoEncoderNet(out_shape=(151, 200), latent_dim=8,
                         filters=(4, 8, 16, 32))
    shots = jnp.zeros((2, 1000, 200, 18))  # [B, nt, nr, ns]
    params = net.init(KEY, shots)
    out, z = net.apply(params, shots)
    assert out.shape == (2, 151, 200, 1)
    assert z.shape == (2, 8)
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0


def test_velocity_output_transform():
    f01 = jnp.full((1, 4, 5, 1), 0.5)
    true = jnp.full((1, 4, 5, 1), 3000.0).at[:, 0].set(1500.0)
    v = apply_velocity_output(f01, true, vmin=1500.0, vmax=3500.0)
    assert float(v[0, 1, 0, 0]) == 2500.0
    assert float(v[0, 0, 0, 0]) == 1500.0  # water pinned


def test_elastic_net_and_output():
    net = ElasticAutoEncoderNet(out_shape=(100, 150), n_fields=2,
                                filters=(4, 8, 16, 32))
    vx = jnp.zeros((1, 800, 150, 6))
    vz = jnp.zeros((1, 800, 150, 6))
    params = net.init(KEY, vx, vz)
    deltas, z = net.apply(params, vx, vz)
    assert deltas.shape == (1, 100, 150, 2)
    lowf = jnp.stack([jnp.full((100, 150), 2000.0),
                      jnp.full((100, 150), 1000.0)], -1)[None]
    true = lowf + 100.0
    m = apply_elastic_output(deltas, lowf, true,
                             delta_scale=(300.0, 200.0),
                             clip_min=(1500.0, 700.0),
                             clip_max=(4700.0, 2700.0), pin_rows=5)
    assert m.shape == (1, 100, 150, 2)
    np.testing.assert_allclose(np.asarray(m[0, :5]), np.asarray(true[0, :5]))


def test_elastic_output_clip_modes():
    """clip_mode="ste": the forward value is identical to the hard
    clip, but a cell railed at a physical bound still receives misfit
    gradient (the hard clip's zero-gradient makes railing an
    absorbing state for a drifting inversion)."""
    lowf = jnp.full((1, 4, 5, 1), 4600.0)
    true = lowf
    deltas = jnp.full((1, 4, 5, 1), 500.0)  # rails at clip_max 4700

    def out_mean(d, mode):
        return jnp.mean(apply_elastic_output(
            d, lowf, true, delta_scale=(1.0,), clip_min=(1500.0,),
            clip_max=(4700.0,), clip_mode=mode))

    v_hard = out_mean(deltas, "hard")
    v_ste = out_mean(deltas, "ste")
    assert float(v_hard) == float(v_ste) == 4700.0
    g_hard = jax.grad(out_mean)(deltas, "hard")
    g_ste = jax.grad(out_mean)(deltas, "ste")
    assert float(jnp.max(jnp.abs(g_hard))) == 0.0
    assert float(jnp.min(jnp.abs(g_ste))) > 0.0


def test_vae_reparam_and_kl():
    net = VaeNet(out_shape=(64, 64), latent_dim=8, filters=(4, 8, 16))
    shots = jnp.zeros((2, 256, 64, 4))
    params = net.init({"params": KEY, "latent": KEY}, shots)
    out, mu, logvar, z = net.apply(params, shots)
    assert out.shape == (2, 64, 64, 1)
    assert mu.shape == (2, 8) and logvar.shape == (2, 8)
    # stochastic path differs from deterministic
    out2, mu2, logvar2, z2 = net.apply(
        params, shots, deterministic=False,
        rngs={"latent": jax.random.PRNGKey(42)})
    assert not np.allclose(np.asarray(z), np.asarray(z2))
    kl = kl_divergence(mu, logvar)
    assert np.isfinite(float(kl))
    # KL of standard normal stats is 0
    assert abs(float(kl_divergence(jnp.zeros((2, 8)),
                                   jnp.zeros((2, 8))))) < 1e-6


def test_mcdip_dropout_stochastic():
    net = ElasticAutoEncoderNet(out_shape=(50, 60), n_fields=2,
                                filters=(4, 8, 16), dropout=0.3)
    vx = jnp.ones((1, 400, 60, 4))
    vz = jnp.ones((1, 400, 60, 4))
    params = net.init(KEY, vx, vz)
    a = net.apply(params, vx, vz, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(1)})[0]
    b = net.apply(params, vx, vz, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(2)})[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_unet_shapes():
    net = UNet(out_channels=1, filters=(4, 8, 16), out_shape=(151, 200))
    x = jnp.zeros((1, 1000, 200, 18))
    params = net.init(KEY, x)
    out, _ = net.apply(params, x)
    assert out.shape == (1, 151, 200, 1)


def test_unet_odd_input_dims():
    """Odd spatial dims (the real workloads have nt=4001): avg_pool
    floors, resize_2x doubles, so decoder/skip sizes disagree at every
    level — UpCat must pad/crop-match instead of raising (ADVICE r1)."""
    net = UNet(out_channels=1, filters=(4, 8, 16), out_shape=(151, 200))
    x = jnp.zeros((1, 401, 200, 18))  # odd nt after 4x decimation
    params = net.init(KEY, x)
    out, _ = net.apply(params, x)
    assert out.shape == (1, 151, 200, 1)
    # odd both ways, plus ResUNet++/MultiScale/R2U decoder paths
    from physicsbasedfwi2_tpu.models import ResUNetPlusPlus, MultiScaleUNet
    x2 = jnp.zeros((1, 101, 75, 3))
    for net2 in (UNet(filters=(4, 8), out_shape=(51, 61)),
                 ResUNetPlusPlus(filters=(4, 8, 16), out_shape=(51, 61)),
                 MultiScaleUNet(filters=(4, 8), out_shape=(51, 61))):
        p2 = net2.init(KEY, x2)
        out2, _ = net2.apply(p2, x2)
        assert out2.shape == (1, 51, 61, 1), type(net2).__name__


def test_unet_marmousi_workload_constructs():
    """The registered marmousi_acoustic_unet workload's engine must be
    constructible at the real shapes (nt=4001) — regression for the
    round-1 UpCat crash."""
    net = UNet(out_channels=1, filters=(4, 8), out_shape=(151, 200))
    x = jnp.zeros((1, 4001, 200, 18))
    params = net.init(KEY, x)
    out, _ = net.apply(params, x)
    assert out.shape == (1, 151, 200, 1)


def test_fno_and_lploss():
    net = FNO2d(out_channels=1, width=8, depth=2, modes=4)
    x = jnp.zeros((2, 32, 32, 3))
    params = net.init(KEY, x)
    out, _ = net.apply(params, x)
    assert out.shape == (2, 32, 32, 1)
    assert float(lp_loss(jnp.ones((2, 8, 8)), jnp.ones((2, 8, 8)))) < 1e-6


def test_flow_invertibility():
    flow = LatentFlow(n_blocks=4, hidden=16)
    z = jax.random.normal(KEY, (3, 8))
    params = flow.init(KEY, z)
    y, ld = flow.apply(params, z)
    z_back, ld_back = flow.apply(params, y, reverse=True)
    np.testing.assert_allclose(np.asarray(z_back), np.asarray(z),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld), -np.asarray(ld_back),
                               rtol=1e-4, atol=1e-5)


def test_planar_flow():
    flow = PlanarFlowStack(n_flows=3)
    z = jax.random.normal(KEY, (4, 8))
    params = flow.init(KEY, z)
    y, ld = flow.apply(params, z)
    assert y.shape == z.shape and ld.shape == (4,)


def test_gan_pieces():
    disc = define_discriminator("n_layers", base=8, n_layers=2)
    x = jnp.zeros((2, 64, 64, 1))
    params = disc.init(KEY, x)
    pred = disc.apply(params, x)
    assert pred.ndim == 4
    for mode in ("lsgan", "vanilla", "wgangp"):
        assert np.isfinite(float(gan_loss(pred, True, mode)))
        assert np.isfinite(float(gan_loss(pred, False, mode)))
    pool = ImagePool(pool_size=4)
    imgs = np.zeros((2, 4, 4, 1), np.float32)
    out = pool.query(imgs)
    assert out.shape == imgs.shape


def test_registry_covers_reference_names():
    # every reference define_G workload family must resolve
    names = ["Auto22", "Unet22", "AutoElMar22", "AutoSEAMMar22",
             "AutoElMarMCDIP22", "AutoElFullRhoMar22", "Vae2",
             "VaeLatent2NoPhy", "VaeNoPhy", "Vaevel", "AutoNF", "AutoWav",
             "Auto23", "Auto24", "Auto25", "Auto26", "Simple24",
             "resnet_9blocks", "unet_128", "Att", "classic"]
    for n in names:
        g = define_generator(n, out_shape=(64, 64))
        assert g is not None, n
    try:
        define_generator("nope")
        assert False
    except KeyError:
        pass


def test_unet3plus_and_multiscale():
    from physicsbasedfwi2_tpu.models import UNet3Plus, MultiScaleUNet
    x = jnp.zeros((1, 64, 64, 2))
    for net in (UNet3Plus(filters=(4, 8, 16), out_shape=(50, 60)),
                MultiScaleUNet(filters=(4, 8, 16), out_shape=(50, 60))):
        p = net.init(KEY, x)
        out, _ = net.apply(p, x)
        assert out.shape == (1, 50, 60, 1)
    for name in ("UNet3Plus", "Multi", "Multi2", "MultiASPP"):
        assert define_generator(name, out_shape=(32, 32)) is not None


def test_r2unet_variants():
    from physicsbasedfwi2_tpu.models import R2UNet
    x = jax.random.normal(KEY, (1, 32, 32, 2))
    for name in ("R2U", "R2AttU"):
        net = define_generator(name, out_shape=(28, 30), filters=(4, 8))
        p = net.init(KEY, x)
        out, _ = net.apply(p, x)
        assert out.shape == (1, 28, 30, 1)
