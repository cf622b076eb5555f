"""Generative VAE pretraining -> frozen-decoder latent inversion.

The reference's two-stage pipeline (SURVEY.md §2.3): VaeNoPhy /
Vaevel train a model-domain VAE without physics (VaeNoPhy_model.py,
Vaevel_model.py), then VaeLatent2NoPhy freezes the decoder and
optimizes latents through the propagator
(VaeLatent2NoPhy_model.py:395-560).  Round 1 shipped the inversion
engine but nothing produced ``decoder_params`` — this driver is that
missing first stage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from physicsbasedfwi2_tpu.models import ModelVae, kl_divergence


def make_model_bank(n: int, nz: int, nx: int, *, water_rows: int = 0,
                    seed: int = 0) -> np.ndarray:
    """A small prior ensemble of velocity models (the reference
    pretrains on a directory of model realizations)."""
    from physicsbasedfwi2_tpu.data.synthetic import make_marmousi_like
    return np.stack([make_marmousi_like(nz, nx, seed=seed + i,
                                        water_rows=water_rows)
                     for i in range(n)])


def pretrain_model_vae(models: np.ndarray, *, latent_dim: int = 8,
                       filters=(8, 16, 32), epochs: int = 200,
                       batch_size: int = 8, lr: float = 1e-3,
                       kl_weight: float = 1e-4, seed: int = 0,
                       vmin: float | None = None,
                       vmax: float | None = None):
    """Train a model-domain VAE on [N, nz, nx] velocity models.

    Returns (net, params, norm, history) where norm = (vmin, vmax)
    maps the decoder's [0, 1] output back to velocities — hand these
    to ``LatentInversionEngine(decoder_net=net, decoder_params=params,
    decoder_norm=norm)``.
    """
    models = np.asarray(models, np.float32)
    n, nz, nx = models.shape
    vmin = float(models.min()) if vmin is None else vmin
    vmax = float(models.max()) if vmax is None else vmax
    x01 = (models - vmin) / (vmax - vmin + 1e-12)
    x01 = jnp.asarray(x01)[..., None]  # [N, nz, nx, 1]

    net = ModelVae(out_shape=(nz, nx), latent_dim=latent_dim,
                   filters=tuple(filters))
    key = jax.random.PRNGKey(seed)
    params = net.init({"params": key, "latent": key}, x01[:1])
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(p, batch, rng):
        recon, mu, logvar, z = net.apply(
            p, batch, deterministic=False, rngs={"latent": rng})
        rec = jnp.mean((recon - batch) ** 2)
        return rec + kl_weight * kl_divergence(mu, logvar), rec

    @jax.jit
    def step(p, opt_state, batch, rng):
        (loss, rec), g = jax.value_and_grad(loss_fn, has_aux=True)(
            p, batch, rng)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(p, updates), opt_state, loss, rec

    rng = jax.random.PRNGKey(seed + 1)
    history = []
    idx = np.arange(n)
    nprng = np.random.default_rng(seed)
    for epoch in range(epochs):
        nprng.shuffle(idx)
        tot = 0.0
        for s in range(0, n, batch_size):
            rng, sub = jax.random.split(rng)
            batch = x01[idx[s : s + batch_size]]
            params, opt_state, loss, rec = step(params, opt_state,
                                                batch, sub)
            tot += float(rec)
        history.append(tot / max(1, -(-n // batch_size)))
    return net, params, (vmin, vmax), history
