"""PPNet: prototype-based segmentation head over a feature backbone.

One Flax module covers the reference's three model classes
(`model.py:74` PPNet, `model_multiscale.py:71` PPNetMultiScale,
`model_multiscale_group.py:82` grouped PPNetMultiScale): single-scale is
the ``num_scales=1`` case of the multi-scale math, and grouping is an
optional head (``spec.num_groups > 0`` + ``grouped=True``).

Pipeline (NHWC throughout):
  backbone (+ optional MSC input pyramid, ref utils.py:71-111)
  -> add-on (sigmoid / bottleneck convs, ref model_multiscale.py:174-218)
  -> per-scale L2 prototype distances (ops.prototype)
  -> log activation
  -> last linear layer, or per-class group projection + exp + group last
     layer (ref model_multiscale_group.py:283-308)

The group projection is stored dense as (C, G, Pc_max) with padded slots
pinned to zero by the masked simplex projection — a single einsum instead
of the reference's per-class ``nn.ModuleList`` Python loop, which XLA maps
onto one MXU matmul.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from scaleprotoseg_tpu.ops.prototype import (
    distance_to_similarity, scale_l2_distances)
from scaleprotoseg_tpu.ops.resize import (resize_bilinear,
                                          resize_bilinear_factor)
from scaleprotoseg_tpu.ops.simplex import projection_simplex_sort_masked
from scaleprotoseg_tpu.spec import ProtoSpec


class PPNetOutput(NamedTuple):
    logits: jax.Array                      # (B, Hp, Wp, C)
    distances: jax.Array                   # (B, Hp, Wp, P)
    activations: jax.Array                 # (B, Hp, Wp, P)
    group_activations: Optional[jax.Array]  # (B, Hp, Wp, C, G) | None


def _uniform_unit_init(key, shape, dtype=jnp.float32):
    """torch.rand equivalent: U[0, 1) (ref model_multiscale.py:111)."""
    return jax.random.uniform(key, shape, dtype)


class ScaleHead(nn.Module):
    """WeightedAgg (ref scale_head.py:7-65): inject previous-scale
    prototype information into the next scale's features."""

    output_type: str  # 'sum' | 'mult' | 'concat'
    channel_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, activations, prototypes):
        # activations (B,H,W,Ps), prototypes (Ps, D)
        weight_sum = jnp.einsum("bhwp,pd->bhwd", activations, prototypes)
        if self.output_type == "sum":
            return (x + weight_sum) / 2.0
        if self.output_type == "mult":
            return jnp.sqrt(x * weight_sum)
        if self.output_type == "concat":
            h = jnp.concatenate([x, weight_sum], axis=-1)
            h = nn.Dense(self.channel_dim, dtype=self.dtype,
                         param_dtype=jnp.float32, name="linear")(h)
            return nn.sigmoid(h)
        raise ValueError(self.output_type)


class AddOnLayers(nn.Module):
    """Backbone-to-prototype adapter (ref model_multiscale.py:174-218).

    'deeplab_simple' (all shipped configs): plain sigmoid.
    'bottleneck': 1x1 conv chain halving channels to proto depth.
    'regular': conv-relu-conv-sigmoid.
    """

    add_on_type: str
    in_channels: int
    proto_depth: int
    bottleneck_stride: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        # Enter the compute dtype BEFORE the nonlinearity: the ASPP
        # accumulates fp32, and sigmoid-of-fp32 makes XLA keep a
        # full-resolution fp32 residual for the backward (at EM a
        # 1 GB/step f32[2,512,512,256] read+write in the r5 trace).
        # In bf16 the residual halves; the fp32 default is untouched.
        if self.dtype != jnp.float32:
            x = x.astype(self.dtype)
        if self.add_on_type == "deeplab_simple":
            return nn.sigmoid(x)
        if self.add_on_type.startswith("bottleneck"):
            i = 0
            if self.add_on_type == "bottleneck_pool":
                x = nn.Conv(self.in_channels, (3, 3),
                            strides=(self.bottleneck_stride,) * 2,
                            padding=[(1, 1), (1, 1)], kernel_init=kaiming,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"conv{i}")(x)
                x = nn.relu(x)
                i += 1
            cur = self.in_channels
            first = True
            while cur > self.proto_depth or first:
                first = False
                out = max(self.proto_depth, cur // 2)
                x = nn.Conv(out, (1, 1), kernel_init=kaiming,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"conv{i}")(x)
                x = nn.relu(x)
                x = nn.Conv(out, (1, 1), kernel_init=kaiming,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"conv{i + 1}")(x)
                x = nn.relu(x) if out > self.proto_depth else nn.sigmoid(x)
                i += 2
                cur = cur // 2
            return x
        # 'regular'
        x = nn.Conv(self.proto_depth, (1, 1), kernel_init=kaiming,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv0")(x)
        x = nn.relu(x)
        x = nn.Conv(self.proto_depth, (1, 1), kernel_init=kaiming,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(x)
        return nn.sigmoid(x)


class PPNet(nn.Module):
    """Prototype segmentation model.

    Attributes:
      backbone: feature extractor module called as ``backbone(x, train_bn)``.
      spec: static prototype-bank metadata.
      backbone_channels: backbone output channel count (== spec.feature_depth
        for the concat-ASPP paths).
      grouped: enable the group-projection head.
      msc_scales: MSC input-pyramid scales ((), or (0.5, 0.75) for
        pascal/coco — ref deeplab_features.py gin `scales`).
      incorrect_strength: off-class init for the (group) last layer.
    """

    backbone: nn.Module
    spec: ProtoSpec
    backbone_channels: int
    add_on_type: str = "deeplab_simple"
    activation_fn: str = "log"
    grouped: bool = False
    incorrect_strength: float = -0.5
    msc_scales: Tuple[float, ...] = ()
    scale_head_type: Optional[str] = None
    bottleneck_stride: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        spec = self.spec
        self.features = self.backbone
        self.add_on = AddOnLayers(
            add_on_type=self.add_on_type, in_channels=self.backbone_channels,
            proto_depth=spec.proto_depth,
            bottleneck_stride=self.bottleneck_stride, dtype=self.dtype,
            name="add_on_layers")
        self.prototype_vectors = self.param(
            "prototype_vectors", _uniform_unit_init,
            (spec.num_prototypes, spec.proto_depth))
        if self.scale_head_type is not None:
            self.scale_head = ScaleHead(self.scale_head_type,
                                        spec.proto_depth, dtype=self.dtype)
        else:
            self.scale_head = None

        identity = spec.class_identity

        if self.grouped:
            if spec.num_groups <= 0:
                raise ValueError("grouped=True requires spec.num_groups > 0")
            pc_mask = spec.class_proto_mask
            inc = self.incorrect_strength

            def group_init(key, shape, dtype=jnp.float32):
                # torch Linear default (U(-1/sqrt(fan_in), 1/sqrt(fan_in)))
                # followed by the simplex projection applied at init
                # (ref model_multiscale_group.py:516-517).
                fan_in = np.maximum(spec.class_counts, 1)[:, None, None]
                bound = 1.0 / np.sqrt(fan_in)
                w = jax.random.uniform(key, shape, dtype, -1.0, 1.0) * bound
                return projection_simplex_sort_masked(
                    w, jnp.asarray(pc_mask)[:, None, :]
                    * jnp.ones(shape[:2] + (1,)))

            self.group_projection = self.param(
                "group_projection", group_init,
                (spec.num_classes, spec.num_groups,
                 spec.max_protos_per_class))

            gci = spec.group_class_identity  # (C*G, C), empty classes zeroed
            init_group_w = (gci + inc * (1.0 - gci)) * \
                (gci.sum(axis=1, keepdims=True) > 0)

            self.last_layer_group = self.param(
                "last_layer_group",
                lambda key, shape: jnp.asarray(init_group_w, jnp.float32),
                init_group_w.shape)
        else:
            # +1 own-class / incorrect_strength other (ref
            # model_multiscale.py:449-477; default strength -0.5).
            init_w = identity + self.incorrect_strength * (1.0 - identity)
            self.last_layer = self.param(
                "last_layer",
                lambda key, shape: jnp.asarray(init_w, jnp.float32),
                init_w.shape)

    # ------------------------------------------------------------------
    # Backbone + MSC input pyramid (ref utils.py:71-111)
    # ------------------------------------------------------------------
    def backbone_features(self, x, train: bool = False,
                          train_bn: bool = False):
        base = self.features(x, train_bn)
        if not self.msc_scales:
            return base
        pyramid = []
        for p in self.msc_scales:
            # scale_factor semantics, not size semantics (ref
            # utils.py:101 F.interpolate(x, scale_factor=p))
            xp = resize_bilinear_factor(x, p)
            pyramid.append(self.features(xp, train_bn))
        hb, wb = base.shape[1], base.shape[2]
        fused = base
        for f in pyramid:
            fused = jnp.maximum(fused, resize_bilinear(f, hb, wb))
        if train:
            return [base] + pyramid + [fused]
        return fused

    def conv_features(self, x, train: bool = False, train_bn: bool = False):
        feats = self.backbone_features(x, train=train, train_bn=train_bn)
        if isinstance(feats, list):
            return [self._cast(self.add_on(f)) for f in feats]
        return self._cast(self.add_on(feats))

    def _cast(self, f):
        """Keep features in the compute dtype after the add-on sigmoid.

        The ASPP head accumulates in fp32 and the sigmoid follows, so
        without this cast the feature map entering the prototype head is
        fp32 even under the bf16 recipe — at the EM config that is a
        full-resolution f32[B,512,512,256] tensor whose extra bytes the
        r5 trace priced at ~4 ms/step of pure HBM traffic, and it pushes
        the distance cross-term off the bf16 MXU path
        (ops/prototype.py).  fp32 default path is untouched."""
        return f.astype(self.dtype) if self.dtype != jnp.float32 else f

    # ------------------------------------------------------------------
    # Prototype head
    # ------------------------------------------------------------------
    def prototype_distances_from_features(self, f):
        spec = self.spec
        if self.scale_head is None:
            return scale_l2_distances(f, self.prototype_vectors,
                                      spec.scale_bounds)
        # Coarse-to-fine loop injecting previous-scale activations
        # (ref model_multiscale.py:299-317).
        depth = spec.proto_depth
        outs = {}
        prev = None
        for s in range(spec.num_scales - 1, -1, -1):
            lo, hi = spec.scale_bounds[s]
            xs = f[..., s * depth:(s + 1) * depth]
            if prev is not None:
                prev_lo, prev_hi = spec.scale_bounds[s + 1]
                acts = distance_to_similarity(prev, self.activation_fn)
                xs = self.scale_head(
                    xs, acts, self.prototype_vectors[prev_lo:prev_hi])
            d = scale_l2_distances(xs, self.prototype_vectors[lo:hi],
                                   ((0, hi - lo),))
            outs[s] = d
            prev = d
        return jnp.concatenate([outs[s] for s in range(spec.num_scales)],
                               axis=-1)

    def compute_group(self, activations):
        """Dense group projection: exp(per-class linear of the class's
        prototype activations) (ref model_multiscale_group.py:283-303).

        activations: (..., P) -> (..., C, G)
        """
        spec = self.spec
        # Scatter the (C, G, Pc) weights into full-P columns once (tiny)
        # so the per-pixel contraction is a plain matmul over P — a
        # take() of the (..., P) activations would backprop via TPU's
        # serial scatter-add in the full-joint group phase.
        sel = jnp.asarray(spec.class_proto_onehot)         # (C, Pc, P)
        w_full = jnp.einsum("cgq,cqp->cgp", self.group_projection, sel)
        scores = jnp.einsum("...p,cgp->...cg", activations, w_full,
                            preferred_element_type=jnp.float32)
        out = jnp.exp(scores)
        # Classes without prototypes are absent from the reference's packed
        # concat; zero their slots so they contribute nothing downstream.
        has = jnp.asarray(spec.class_has_protos)
        return out * has[..., :, None]

    def forward_from_conv_features(self, f) -> PPNetOutput:
        distances = self.prototype_distances_from_features(f)
        activations = distance_to_similarity(distances, self.activation_fn)
        if self.grouped:
            group_act = self.compute_group(activations)
            flat = group_act.reshape(group_act.shape[:-2] + (-1,))
            logits = jnp.einsum("...k,kc->...c", flat, self.last_layer_group,
                                preferred_element_type=jnp.float32)
        else:
            group_act = None
            # last_layer keeps the full bank's rows (checkpoint parity);
            # activations carry only the scale-covered prototypes, so
            # slice to the distance layout (identity except on
            # floor-division-leftover banks, e.g. COCO group 2054 -> 2052).
            w = self.last_layer[:self.spec.num_active_prototypes]
            logits = jnp.einsum("...p,pc->...c", activations, w,
                                preferred_element_type=jnp.float32)
        return PPNetOutput(logits=logits, distances=distances,
                           activations=activations,
                           group_activations=group_act)

    def __call__(self, x, train: bool = False, train_bn: bool = False
                 ) -> Union[PPNetOutput, List[PPNetOutput]]:
        feats = self.conv_features(x, train=train, train_bn=train_bn)
        if isinstance(feats, list):
            return [self.forward_from_conv_features(f) for f in feats]
        return self.forward_from_conv_features(feats)

    def fast_logits(self, x):
        """Inference fast path: backbone + add-on, then the fused Pallas
        prototype head (distances + log activation + [group projection +
        exp +] last layer in one kernel, no HBM intermediates).  Falls
        back to the XLA reference head for non-log activations."""
        feats = self.conv_features(x, train=False)
        if self.activation_fn != "log" or self.scale_head is not None:
            return self.forward_from_conv_features(feats).logits
        from scaleprotoseg_tpu.ops.pallas_proto import fused_proto_logits
        if self.grouped:
            return fused_proto_logits(
                feats, self.prototype_vectors, None, self.spec,
                group_projection=self.group_projection,
                last_layer_group=self.last_layer_group)
        return fused_proto_logits(feats, self.prototype_vectors,
                                  self.last_layer, self.spec)

    def push_forward(self, x):
        """(conv_features, distances) pairs for prototype projection
        (ref model_multiscale.py:390-398)."""
        feats = self.conv_features(x, train=False)
        if isinstance(feats, list):
            return [(f, self.prototype_distances_from_features(f))
                    for f in feats]
        return feats, self.prototype_distances_from_features(feats)
