"""U-Net and U-Net+ASPP feature extractors (EM / ISBI-2012 path).

The reference's `unet.UNet` / `unet.UNetASPP` live in the missing
`deeplab_pytorch` submodule; only the constructor surface is pinned
(`deeplab_features.py:87-109`): ``UNetASPP(n_channels, out_features,
n_classes, rates, multiscale)`` where ``multiscale=True`` concatenates
the ASPP branch outputs (scale semantics identical to the DeepLab concat
head).  This is a standard 4-down/4-up double-conv U-Net with the final
1x1 head replaced by the ASPP; output resolution equals input resolution
(the prototype grid for EM is full 512x512).

BN here is trainable (EM configs set ``freeze_type='none'``,
`scaleproto_em.gin:61`).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from scaleprotoseg_tpu.models.deeplab import ASPP
from scaleprotoseg_tpu.models.layers import ConvBN


class DoubleConv(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train_bn: bool = False):
        x = ConvBN(self.features, (3, 3), dtype=self.dtype,
                   name="conv_a")(x, train_bn)
        return ConvBN(self.features, (3, 3), dtype=self.dtype,
                      name="conv_b")(x, train_bn)


class UNetEncoderDecoder(nn.Module):
    """Shared U-Net body returning full-resolution decoder features."""

    base: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train_bn: bool = False):
        c = self.base
        d0 = DoubleConv(c, self.dtype, name="inc")(x, train_bn)
        x1 = nn.max_pool(d0, (2, 2), strides=(2, 2))
        d1 = DoubleConv(c * 2, self.dtype, name="down1")(x1, train_bn)
        x2 = nn.max_pool(d1, (2, 2), strides=(2, 2))
        d2 = DoubleConv(c * 4, self.dtype, name="down2")(x2, train_bn)
        x3 = nn.max_pool(d2, (2, 2), strides=(2, 2))
        d3 = DoubleConv(c * 8, self.dtype, name="down3")(x3, train_bn)
        x4 = nn.max_pool(d3, (2, 2), strides=(2, 2))
        d4 = DoubleConv(c * 8, self.dtype, name="down4")(x4, train_bn)

        def up(h, skip, feats, name):
            h = jax_resize(h, skip.shape[1], skip.shape[2])
            h = jnp.concatenate([skip, h], axis=-1)
            return DoubleConv(feats, self.dtype, name=name)(h, train_bn)

        u1 = up(d4, d3, c * 4, "up1")
        u2 = up(u1, d2, c * 2, "up2")
        u3 = up(u2, d1, c, "up3")
        u4 = up(u3, d0, c, "up4")
        return u4


def jax_resize(x, height, width):
    import jax
    return jax.image.resize(
        x, x.shape[:-3] + (height, width, x.shape[-1]), method="linear")


class UNetASPP(nn.Module):
    """U-Net body + ASPP head (sum or concat across atrous rates).

    ``fast_aspp`` routes the head through the trainable fused-ASPP
    wrapper (ops/pallas_aspp.py).  At this backbone's shapes (full
    input resolution, shallow C) the wrapper's hybrid picks the XLA
    shifted-matmul forward — the one-pass Pallas kernel loses ~8
    ms/step at EM (halo re-read + 128-lane channel pad) — and the
    tap-packed backward measures NEUTRAL vs XLA AD there (r5 A/B:
    79.1 vs 79.2 ms/step), so the train runner keeps the knob off for
    UNet-ASPP; it exists for experimentation
    (benchmarks/bench_trace_step.py, r5)."""

    out_features: int
    rates: Sequence[int] = (6, 12, 18, 24)
    multiscale: bool = True
    base: int = 64
    dtype: jnp.dtype = jnp.float32
    fast_aspp: bool = False

    @nn.compact
    def __call__(self, x, train_bn: bool = False):
        h = UNetEncoderDecoder(base=self.base, dtype=self.dtype,
                               name="body")(x, train_bn)
        return ASPP(self.out_features, self.rates,
                    "concat" if self.multiscale else "sum",
                    dtype=self.dtype, fast=self.fast_aspp,
                    name="aspp")(h)


class UNet(nn.Module):
    """Plain U-Net feature extractor with a 1x1 head."""

    out_features: int
    base: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train_bn: bool = False):
        h = UNetEncoderDecoder(base=self.base, dtype=self.dtype,
                               name="body")(x, train_bn)
        return nn.Conv(self.out_features, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32, name="outc")(h)
