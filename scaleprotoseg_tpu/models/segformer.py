"""SegFormer (MiT) backbone for the EM branch.

The reference's EM modules carry a SegFormer code path whose model class
lives in the missing ``deeplab_pytorch`` submodule: only the usage
contract survives — a features module whose repr starts with 'SEGFORMER',
with a ``.segformer`` transformer encoder (joint phase, 1x lr) and a
``.decode_head`` (warm-up trainable, 10x lr in joint)
(`/root/reference/segmentation/em/module_multiscale_em.py:338-405`;
``transformers==4.34.1`` in requirements pins the MiT family).  This is a
from-scratch Flax reconstruction honoring that contract:

- ``segformer``: Mix-Transformer encoder (overlapped patch embeddings,
  efficient self-attention with spatial-reduction ratios, Mix-FFN with a
  3x3 depthwise conv instead of positional encodings) producing 4 stage
  maps at strides 4/8/16/32.
- ``decode_head``: the all-MLP head's per-stage linear projections to
  ``n_out`` channels; each projected stage is bilinearly upsampled to the
  stride-8 grid and the four maps are CONCATENATED — each transformer
  stage is one prototype "scale" (fine -> coarse, matching the concat-
  ASPP convention of `model_multiscale.py:294-295`), so the output is
  (B, H/8, W/8, 4 * n_out) and slots directly into the 4-scale PPNet.

Optimizer-group parity: ``train.optim.label_of_path`` maps every
``decode_head`` parameter into the ASPP groups (warm-up trainable, 10x
joint lr) and the encoder into ``features_conv`` (1x), replicating the
EM module's param selection exactly.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from scaleprotoseg_tpu.ops.resize import resize_bilinear

# MiT variants: (embed dims, depths, heads, spatial-reduction ratios)
MIT_VARIANTS = {
    "b0": ((32, 64, 160, 256), (2, 2, 2, 2), (1, 2, 5, 8), (8, 4, 2, 1)),
    "b1": ((64, 128, 320, 512), (2, 2, 2, 2), (1, 2, 5, 8), (8, 4, 2, 1)),
    "b2": ((64, 128, 320, 512), (3, 4, 6, 3), (1, 2, 5, 8), (8, 4, 2, 1)),
}


class MixFFN(nn.Module):
    """FC -> 3x3 depthwise conv (positional information) -> GELU -> FC."""

    dim: int
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        h = nn.Dense(self.hidden, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(x)
        h = nn.Conv(self.hidden, (3, 3), feature_group_count=self.hidden,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="dwconv")(h)
        h = nn.gelu(h)
        return nn.Dense(self.dim, dtype=self.dtype,
                        param_dtype=jnp.float32, name="fc2")(h)


class EfficientSelfAttention(nn.Module):
    """Multi-head attention whose keys/values come from an ``sr``-times
    spatially reduced map (strided conv + LayerNorm) — SegFormer's
    linear-complexity attention."""

    dim: int
    heads: int
    sr: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        b, h, w, c = x.shape
        kv_in = x
        if self.sr > 1:
            kv_in = nn.Conv(c, (self.sr, self.sr),
                            strides=(self.sr, self.sr), dtype=self.dtype,
                            param_dtype=jnp.float32, name="sr")(x)
            kv_in = nn.LayerNorm(dtype=jnp.float32, name="sr_norm")(kv_in)
        q = x.reshape(b, h * w, c)
        kv = kv_in.reshape(b, -1, c)
        out = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=c, out_features=c,
            dtype=self.dtype, param_dtype=jnp.float32,
            name="attn")(q, kv)
        return out.reshape(b, h, w, c)


class TransformerBlock(nn.Module):
    dim: int
    heads: int
    sr: int
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x)
        x = x + EfficientSelfAttention(self.dim, self.heads, self.sr,
                                       dtype=self.dtype, name="attn")(h)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x)
        x = x + MixFFN(self.dim, self.mlp_ratio * self.dim,
                       dtype=self.dtype, name="mlp")(h)
        return x


class OverlapPatchEmbed(nn.Module):
    dim: int
    patch: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch // 2
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)), dtype=self.dtype,
                    param_dtype=jnp.float32, name="proj")(x)
        return nn.LayerNorm(dtype=jnp.float32, name="norm")(x)


class MiTEncoder(nn.Module):
    """4-stage Mix-Transformer; returns the per-stage NHWC feature maps
    at strides 4, 8, 16, 32."""

    variant: str = "b0"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dims, depths, heads, srs = MIT_VARIANTS[self.variant]
        outs = []
        for i in range(4):
            x = OverlapPatchEmbed(dims[i], patch=7 if i == 0 else 3,
                                  stride=4 if i == 0 else 2,
                                  dtype=self.dtype,
                                  name=f"patch_embed{i + 1}")(x)
            for j in range(depths[i]):
                x = TransformerBlock(dims[i], heads[i], srs[i],
                                     dtype=self.dtype,
                                     name=f"block{i + 1}_{j}")(x)
            x = nn.LayerNorm(dtype=jnp.float32, name=f"norm{i + 1}")(x)
            outs.append(x)
        return outs


class SegFormerDecodeHead(nn.Module):
    """Per-stage linear projections of the all-MLP head (the fuse conv is
    omitted — the prototype model consumes the concatenation itself)."""

    n_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, stage_maps, out_hw: Tuple[int, int]):
        outs = []
        for i, f in enumerate(stage_maps):
            p = nn.Dense(self.n_out, dtype=self.dtype,
                         param_dtype=jnp.float32, name=f"linear_c{i}")(f)
            if p.shape[1:3] != out_hw:
                p = resize_bilinear(p, out_hw[0], out_hw[1])
            outs.append(p)
        return jnp.concatenate(outs, axis=-1)  # fine -> coarse


class SegFormer(nn.Module):
    """SegFormer feature extractor with multiscale-concat output
    (B, H/8, W/8, 4 * n_out); stage s occupies channels
    [s*n_out, (s+1)*n_out) fine -> coarse."""

    n_out: int
    variant: str = "b0"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train_bn: bool = False):
        # train_bn accepted for backbone-interface parity; SegFormer has
        # LayerNorms only, nothing to freeze.
        stages = MiTEncoder(self.variant, dtype=self.dtype,
                            name="segformer")(x)
        out_hw = stages[1].shape[1:3]  # stride-8 grid, like the ASPP paths
        return SegFormerDecodeHead(self.n_out, dtype=self.dtype,
                                   name="decode_head")(stages, out_hw)
