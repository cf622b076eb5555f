"""GAN-prior FWI (the seisgan/ capability).

Reference: seisgan/fwi/layers.py — ``FWIConfiguration`` +
``FWILoss(autograd.Function)`` (145-201: per-shot Devito forward +
gradient with normalized dJ/dm), ``well_loss`` (218: borehole sample
misfit), ``compute_prior_loss`` (229: latent Gaussian prior), driven
by MALA/SGHMC sampling over the generator's latent
(seisgan/optimizers.py).

Here: a pretrained generator G(z) -> velocity composes with the
differentiable propagator under one jit; SGLD/SGHMC explore the
posterior over z.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from physicsbasedfwi2_tpu.ops import (
    AcousticConfig, simulate_acoustic, trace_normalize,
)
from physicsbasedfwi2_tpu.optim.sgmcmc import sgld, sghmc


def well_loss(model, well_model, well_cols, *, kind: str = "l2"):
    """Borehole-sample misfit (seisgan well_loss): compare model
    columns at well locations."""
    pred = model[:, well_cols]
    true = well_model[:, well_cols]
    if kind == "l1":
        return jnp.mean(jnp.abs(pred - true))
    return jnp.mean((pred - true) ** 2)


def prior_loss(z):
    """Standard-normal latent prior (seisgan compute_prior_loss)."""
    return 0.5 * jnp.sum(z ** 2)


class GanFWI:
    """Posterior sampling over generator latents with physics +
    well + prior losses."""

    def __init__(self, decode_fn, z_dim: int, workload, *,
                 sampler: str = "sgld", lr: float = 1e-3,
                 lambda_well: float = 0.0, lambda_prior: float = 1e-3,
                 well_cols=None, seed: int = 0):
        """decode_fn: z [1, z_dim] -> vp [nz, nx] (frozen generator)."""
        self.wl = workload
        self.decode = decode_fn
        self.lambda_well = lambda_well
        self.lambda_prior = lambda_prior
        self.well_cols = well_cols
        self.z = jnp.zeros((1, z_dim))
        self.opt = sgld(lr, seed=seed) if sampler == "sgld" else \
            sghmc(lr, seed=seed)
        self.opt_state = self.opt.init(self.z)
        wl = workload

        def loss_fn(z):
            vp = self.decode(z)
            pred = simulate_acoustic(vp, wl.wavelet, *wl.geom, wl.cfg)
            loss = jnp.mean((trace_normalize(pred) - wl.obs_norm) ** 2)
            if self.lambda_well > 0 and self.well_cols is not None:
                loss = loss + self.lambda_well * well_loss(
                    vp, wl.vp_true, jnp.asarray(self.well_cols))
            return loss + self.lambda_prior * prior_loss(z), vp

        @jax.jit
        def step(z, opt_state):
            (loss, vp), g = jax.value_and_grad(loss_fn, has_aux=True)(z)
            updates, opt_state = self.opt.update(g, opt_state)
            return optax.apply_updates(z, updates), opt_state, loss, vp

        self._step = step

    def sample(self, n_steps: int, *, burn_in: int = 0, thin: int = 1):
        """Run the chain; returns (losses, posterior model samples)."""
        losses, samples = [], []
        for i in range(n_steps):
            self.z, self.opt_state, loss, vp = self._step(
                self.z, self.opt_state)
            losses.append(float(loss))
            if i >= burn_in and (i - burn_in) % thin == 0:
                samples.append(vp)
        import numpy as np
        return losses, np.stack([np.asarray(s) for s in samples])
