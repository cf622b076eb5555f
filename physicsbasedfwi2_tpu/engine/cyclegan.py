"""CycleGAN engine (upstream parity: models/cycle_gan_model.py, 194
LoC — kept by the reference for unpaired image translation baselines).

Two resnet generators (A->B, B->A), two PatchGAN discriminators,
adversarial + cycle-consistency + identity losses, image history
pools for the discriminators.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from physicsbasedfwi2_tpu.models import (
    ResnetGenerator, NLayerDiscriminator, gan_loss, ImagePool,
)


class CycleGanEngine:
    def __init__(self, *, channels: int = 1, base: int = 16,
                 n_blocks: int = 3, lr: float = 2e-4, beta1: float = 0.5,
                 lambda_cycle: float = 10.0, lambda_idt: float = 0.5,
                 gan_mode: str = "lsgan", in_shape=(64, 64), seed: int = 0):
        self.lambda_cycle = lambda_cycle
        self.lambda_idt = lambda_idt
        self.gan_mode = gan_mode
        kg = jax.random.split(jax.random.PRNGKey(seed), 4)
        x = jnp.zeros((1, *in_shape, channels))
        self.G = ResnetGenerator(out_channels=channels, base=base,
                                 n_blocks=n_blocks)
        self.F = ResnetGenerator(out_channels=channels, base=base,
                                 n_blocks=n_blocks)
        self.DA = NLayerDiscriminator(base=base, n_layers=2)
        self.DB = NLayerDiscriminator(base=base, n_layers=2)
        self.params = {
            "G": self.G.init(kg[0], x), "F": self.F.init(kg[1], x),
            "DA": self.DA.init(kg[2], x), "DB": self.DB.init(kg[3], x),
        }
        self.g_opt = optax.adam(lr, b1=beta1)
        self.d_opt = optax.adam(lr, b1=beta1)
        self.g_state = self.g_opt.init(
            {"G": self.params["G"], "F": self.params["F"]})
        self.d_state = self.d_opt.init(
            {"DA": self.params["DA"], "DB": self.params["DB"]})
        self.pool_A = ImagePool(50)
        self.pool_B = ImagePool(50)
        self._build()

    def _build(self):
        gm = self.gan_mode

        def g_loss(gp, dp, a, b):
            fake_b = self.G.apply(gp["G"], a)
            fake_a = self.F.apply(gp["F"], b)
            rec_a = self.F.apply(gp["F"], fake_b)
            rec_b = self.G.apply(gp["G"], fake_a)
            idt_b = self.G.apply(gp["G"], b)
            idt_a = self.F.apply(gp["F"], a)
            adv = (gan_loss(self.DB.apply(dp["DB"], fake_b), True, gm)
                   + gan_loss(self.DA.apply(dp["DA"], fake_a), True, gm))
            cyc = (jnp.mean(jnp.abs(rec_a - a))
                   + jnp.mean(jnp.abs(rec_b - b))) * self.lambda_cycle
            idt = (jnp.mean(jnp.abs(idt_b - b))
                   + jnp.mean(jnp.abs(idt_a - a))) * (
                self.lambda_cycle * self.lambda_idt)
            return adv + cyc + idt, (fake_a, fake_b)

        @jax.jit
        def g_step(gp, g_state, dp, a, b):
            (loss, fakes), grads = jax.value_and_grad(
                g_loss, has_aux=True)(gp, dp, a, b)
            updates, g_state = self.g_opt.update(grads, g_state)
            return optax.apply_updates(gp, updates), g_state, loss, fakes

        def d_loss(dp, a, b, fake_a, fake_b):
            la = 0.5 * (gan_loss(self.DA.apply(dp["DA"], a), True, gm)
                        + gan_loss(self.DA.apply(dp["DA"], fake_a),
                                   False, gm))
            lb = 0.5 * (gan_loss(self.DB.apply(dp["DB"], b), True, gm)
                        + gan_loss(self.DB.apply(dp["DB"], fake_b),
                                   False, gm))
            return la + lb

        @jax.jit
        def d_step(dp, d_state, a, b, fake_a, fake_b):
            loss, grads = jax.value_and_grad(d_loss)(dp, a, b, fake_a,
                                                     fake_b)
            updates, d_state = self.d_opt.update(grads, d_state)
            return optax.apply_updates(dp, updates), d_state, loss

        self._g_step, self._d_step = g_step, d_step

    def optimize_parameters(self, a, b):
        gp = {"G": self.params["G"], "F": self.params["F"]}
        dp = {"DA": self.params["DA"], "DB": self.params["DB"]}
        gp, self.g_state, gl, (fake_a, fake_b) = self._g_step(
            gp, self.g_state, dp, a, b)
        fa = jnp.asarray(self.pool_A.query(np.asarray(fake_a)))
        fb = jnp.asarray(self.pool_B.query(np.asarray(fake_b)))
        dp, self.d_state, dl = self._d_step(dp, self.d_state, a, b, fa, fb)
        self.params.update(gp)
        self.params.update(dp)
        gl, dl = map(float, jax.device_get((gl, dl)))
        return {"loss_G": gl, "loss_D": dl}

    def translate(self, a):
        return self.G.apply(self.params["G"], a)
