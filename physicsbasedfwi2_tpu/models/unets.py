"""U-Net generator family.

Capability-equivalents of the reference's U-Net zoo
(networks.py: ClassicU_Net 1031, AttU_Net 1114, R2U_Net 1207,
ASPPU_Net 1372, ResUnetPlusPlus_Net 1459, MultiU_Net 1545,
UNet_3Plus 1865, UnetGenerator 602, UnetMarmousi22_Net 5513).
"""

from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp
from flax import linen as nn

from physicsbasedfwi2_tpu.models.blocks import (
    ASPP, CBAM, ConvBlock, Down, ResidualConv, SqueezeExcite, Up, UpCat,
    resize_2x,
)


class UNet(nn.Module):
    """Classic encoder-decoder with skip connections.

    With ``out_shape`` set, the output is resized/cropped to the model
    grid — the UnetMarmousi22_Net role (seismic in, velocity out,
    networks.py:5513-5681); without, it is same-shape image->image
    (pix2pix role)."""

    out_channels: int = 1
    filters: Sequence[int] = (16, 32, 64, 128)
    out_shape: tuple[int, int] | None = None
    norm: str = "group"
    dropout: float = 0.0
    final_activation: str = "sigmoid"
    use_attention: bool = False  # AttU_Net-style gate via CBAM

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        skips = []
        for f in self.filters:
            x = ConvBlock(f, self.norm, self.dropout)(
                x, deterministic=deterministic)
            skips.append(x)
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = ConvBlock(self.filters[-1] * 2, self.norm)(
            x, deterministic=deterministic)
        for f, skip in zip(reversed(self.filters), reversed(skips)):
            if self.use_attention:
                skip = CBAM()(skip)
            x = UpCat(f, self.norm)(x, skip, deterministic=deterministic)
        if self.out_shape is not None:
            b, h, w, c = x.shape
            nz, nx = self.out_shape
            if h < nz or w < nx:
                import jax
                x = jax.image.resize(x, (b, max(h, nz), max(w, nx), c),
                                     method="bilinear")
            x = x[:, : nz, : nx, :]
        x = nn.Conv(self.out_channels, (1, 1))(x)
        if self.final_activation == "sigmoid":
            x = nn.sigmoid(x)
        elif self.final_activation == "tanh":
            x = nn.tanh(x)
        return x, None  # (field, latent) interface parity


class ASPPUNet(nn.Module):
    """U-Net with an atrous-pyramid bottleneck (ASPPU_Net,
    networks.py:1372)."""

    out_channels: int = 1
    filters: Sequence[int] = (16, 32, 64, 128)
    out_shape: tuple[int, int] | None = None
    norm: str = "group"

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        skips = []
        for f in self.filters:
            x = ConvBlock(f, self.norm)(x, deterministic=deterministic)
            skips.append(x)
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = ASPP(self.filters[-1])(x)
        for f, skip in zip(reversed(self.filters), reversed(skips)):
            x = UpCat(f, self.norm)(x, skip, deterministic=deterministic)
        if self.out_shape is not None:
            x = x[:, : self.out_shape[0], : self.out_shape[1], :]
        x = nn.Conv(self.out_channels, (1, 1))(x)
        return nn.sigmoid(x), None


class ResUNetPlusPlus(nn.Module):
    """Residual U-Net with squeeze-excite skips and ASPP bridge
    (ResUnetPlusPlus_Net, networks.py:1459)."""

    out_channels: int = 1
    filters: Sequence[int] = (16, 32, 64, 128)
    out_shape: tuple[int, int] | None = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        skips = []
        for i, f in enumerate(self.filters):
            x = ResidualConv(f, strides=(1, 1) if i == 0 else (2, 2))(x)
            x = SqueezeExcite()(x)
            skips.append(x)
        x = ASPP(self.filters[-1])(x)
        for f, skip in zip(reversed(self.filters[:-1]),
                           reversed(skips[:-1])):
            x = resize_2x(x)
            dh = x.shape[1] - skip.shape[1]
            dw = x.shape[2] - skip.shape[2]
            skip = jnp.pad(skip, ((0, 0), (dh // 2, dh - dh // 2),
                                  (dw // 2, dw - dw // 2), (0, 0)))
            x = jnp.concatenate([skip, x], axis=-1)
            x = ResidualConv(f)(x)
        if self.out_shape is not None:
            import jax
            b, h, w, c = x.shape
            nz, nx = self.out_shape
            if h < nz or w < nx:
                x = jax.image.resize(x, (b, max(h, nz), max(w, nx), c),
                                     method="bilinear")
            x = x[:, : nz, : nx, :]
        x = nn.Conv(self.out_channels, (1, 1))(x)
        return nn.sigmoid(x), None
