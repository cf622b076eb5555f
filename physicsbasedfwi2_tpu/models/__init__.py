"""Flax generator zoo + name registry.

`define_generator` is the capability-equivalent of the reference's
``define_G`` dispatch (networks.py:163-275): every generator name the
reference accepts maps to a configured Flax module here.  Names are
grouped by architecture family; reference variants that differ only
in acquisition geometry or dataset (e.g. Auto23/24/25/26 — same net,
different shot counts/frequencies, networks.py:11792-14121) map to
the same module parameterized by the workload config.
"""

from __future__ import annotations

from typing import Any, NamedTuple

from physicsbasedfwi2_tpu.models.autoencoders import (
    AutoEncoderNet,
    ElasticAutoEncoderNet,
    FlowAutoEncoderNet,
    ModelParamNet,
    apply_velocity_output,
    apply_elastic_output,
)
from physicsbasedfwi2_tpu.models.vae import (
    VaeNet, VaeFlowNet, ModelVae, kl_divergence,
)
from physicsbasedfwi2_tpu.models.unets import (UNet, ASPPUNet, ResUNetPlusPlus, UNet3Plus, MultiScaleUNet, R2UNet)
from physicsbasedfwi2_tpu.models.gan import (
    ResnetGenerator,
    NLayerDiscriminator,
    PixelDiscriminator,
    gan_loss,
    gradient_penalty,
    ImagePool,
)
from physicsbasedfwi2_tpu.models.fno import FNO2d, SpectralConv1d, SpectralConv2d, lp_loss
from physicsbasedfwi2_tpu.models.flows import LatentFlow, PlanarFlowStack

# name -> (factory, default kwargs). Reference name -> family mapping
# cited per entry.
_GENERATORS: dict[str, tuple[Any, dict[str, Any]]] = {}


def register_generator(name: str, factory, **defaults):
    _GENERATORS[name.lower()] = (factory, defaults)


def define_generator(name: str, out_shape: tuple[int, int] | None = None,
                     **overrides):
    """Instantiate a generator by reference-compatible name."""
    key = name.lower()
    if key not in _GENERATORS:
        raise KeyError(
            f"unknown generator {name!r}; known: {sorted(_GENERATORS)}")
    factory, defaults = _GENERATORS[key]
    kwargs = dict(defaults)
    kwargs.update(overrides)
    if out_shape is not None:
        kwargs["out_shape"] = out_shape
    import dataclasses
    accepted = {f.name for f in dataclasses.fields(factory)}
    kwargs = {k: v for k, v in kwargs.items() if k in accepted}
    return factory(**kwargs)


# --- deep-image-prior autoencoders (networks.py:215-275 Auto* names) ---
for _n in ["Auto", "Auto21", "Auto22", "Auto23", "Auto24", "Auto25",
           "Auto26", "AutoWav", "Simple24", "AutoN"]:
    register_generator(_n, AutoEncoderNet)
register_generator("Auto22CBAM", AutoEncoderNet, use_cbam=True)

# --- elastic two-branch autoencoders (networks.py:7215ff) ---
for _n in ["AutoEl22", "AutoElMar22", "AutoElFullMar22", "AutoSEAMMar22",
           "AutoRealData"]:
    register_generator(_n, ElasticAutoEncoderNet, n_fields=2)
register_generator("AutoElFullRhoMar22", ElasticAutoEncoderNet, n_fields=3)
# Despite the name, the reference's AutoElMarmousiMarZp22_Net carries no
# impedance math: its decoder is three plain vp/vs/rho heads added to the
# low-frequency model (networks.py:10740-10790 Rhoup33/Rhof13/Rhorho;
# prop(vp1, vs1, rho1, ...) at 10880) — i.e. the rho-inversion net under
# a vestigial "Zp" label.  Zp<->(vp,rho) conversions live in
# ops/impedance.py for the parameterization the name advertises.
register_generator("AutoElMarZp22", ElasticAutoEncoderNet, n_fields=3)
register_generator("AutoElMarMCDIP22", ElasticAutoEncoderNet, n_fields=2,
                   dropout=0.1)

# --- U-Nets ---
for _n in ["Unet", "UnetPre", "Unet22", "classic", "NewU", "unet_128",
           "unet_256"]:
    register_generator(_n, UNet)
register_generator("Att", UNet, use_attention=True)
register_generator("ASPP", ASPPUNet)
register_generator("MultiASPP", ASPPUNet)
register_generator("ResUNET", ResUNetPlusPlus)
register_generator("UNet3Plus", UNet3Plus)
register_generator("R2U", R2UNet)
register_generator("R2AttU", R2UNet, use_attention=True)
register_generator("Multi", MultiScaleUNet)
register_generator("Multi2", MultiScaleUNet)

# --- VAEs (networks.py:4336, 14693, 15021, 16507) ---
for _n in ["Vae", "Vae2", "Vae3", "VaeLatentNoPhy", "VaeLatent2NoPhy"]:
    register_generator(_n, VaeNet)
for _n in ["VaeNoPhy", "Vaevel"]:
    register_generator(_n, ModelVae)
# planar-flow VAEs (networks.py:15835 VaeNormalizing_Net, 16190 Phy)
for _n in ["VaeNormalizing", "VaeNormalizingPhy"]:
    register_generator(_n, VaeFlowNet)

# --- flows / FNO / GAN generators ---
register_generator("AutoNF", FlowAutoEncoderNet)
register_generator("FNO", FNO2d)
register_generator("resnet_9blocks", ResnetGenerator, n_blocks=9)
register_generator("resnet_6blocks", ResnetGenerator, n_blocks=6)


class GenOut(NamedTuple):
    """Standard generator output: every registry net's raw return is
    normalized into this, so engines can't silently mismatch on tuple
    arity (the round-1 AutoNF failure mode).

    field: [B, H, W, C] main output; latent: bottleneck (or None);
    mu/logvar: VAE posterior stats; logdet: flow log|det J|."""

    field: Any
    latent: Any = None
    mu: Any = None
    logvar: Any = None
    logdet: Any = None


def pack_output(out) -> GenOut:
    """Map a generator's raw return to GenOut by arity:
    (field, latent) | (field, latent, logdet) |
    (field, mu, logvar, z) | (field, mu, logvar, z, logdet)."""
    if not isinstance(out, tuple):
        return GenOut(out)
    if len(out) == 2:
        return GenOut(out[0], out[1])
    if len(out) == 3:
        return GenOut(out[0], out[1], logdet=out[2])
    if len(out) == 4:
        return GenOut(out[0], out[3], mu=out[1], logvar=out[2])
    if len(out) == 5:
        return GenOut(out[0], out[3], mu=out[1], logvar=out[2],
                      logdet=out[4])
    raise TypeError(f"unrecognized generator output arity {len(out)}")


def apply_generator(net, params, *inputs, deterministic: bool = True,
                    rngs=None) -> GenOut:
    """Apply any registry generator and get a GenOut."""
    return pack_output(net.apply(params, *inputs,
                                 deterministic=deterministic, rngs=rngs))


def define_discriminator(kind: str = "n_layers", **kwargs):
    """``define_D`` equivalent (networks.py:319)."""
    if kind in ("n_layers", "basic"):
        return NLayerDiscriminator(**kwargs)
    if kind == "pixel":
        return PixelDiscriminator(**kwargs)
    raise KeyError(f"unknown discriminator {kind!r}")


__all__ = [
    "define_generator",
    "define_discriminator",
    "register_generator",
    "GenOut",
    "pack_output",
    "apply_generator",
    "VaeFlowNet",
    "AutoEncoderNet",
    "FlowAutoEncoderNet",
    "ElasticAutoEncoderNet",
    "ModelParamNet",
    "apply_velocity_output",
    "apply_elastic_output",
    "VaeNet",
    "ModelVae",
    "kl_divergence",
    "UNet",
    "ASPPUNet",
    "ResUNetPlusPlus",
    "UNet3Plus",
    "MultiScaleUNet",
    "R2UNet",
    "ResnetGenerator",
    "NLayerDiscriminator",
    "PixelDiscriminator",
    "gan_loss",
    "gradient_penalty",
    "ImagePool",
    "FNO2d",
    "SpectralConv1d",
    "SpectralConv2d",
    "lp_loss",
    "LatentFlow",
    "PlanarFlowStack",
]
