"""Model construction: gin-configurable backbone + PPNet factories.

Mirrors the reference factory surface (`deeplab_features.py:63-165`,
`model_multiscale.py:480-515`, `model_multiscale_group.py:590+`,
`model.py:431+`) with the same configurable names and parameters, so the
shipped ``.gin`` files drive identical model shapes.

The reference picks the model *class* (single-scale PPNet vs multi-scale
vs grouped) via which train script imports which ``construct_PPNet``;
here one ``construct_ppnet(variant=...)`` covers all three, and thin
aliases keep the reference entry-point names.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from scaleprotoseg_tpu import configlib
from scaleprotoseg_tpu.configlib import REQUIRED, configurable
from scaleprotoseg_tpu.models.deeplab import DeepLabV2
from scaleprotoseg_tpu.models.ppnet import PPNet
from scaleprotoseg_tpu.models.unet import UNet, UNetASPP
from scaleprotoseg_tpu.spec import ProtoSpec


def _deeplab(n_features, n_blocks, aspp_mode, scales, dtype,
             rates=(6, 12, 18, 24)):
    module = DeepLabV2(n_out=n_features, n_blocks=tuple(n_blocks),
                       atrous_rates=tuple(rates), aspp_mode=aspp_mode,
                       dtype=dtype)
    out_ch = n_features * (len(rates) if aspp_mode.startswith("concat")
                           else 1)
    return module, out_ch, tuple(scales)


@configurable(allowlist=["deeplab_n_features", "scales"])
def deeplabv2_resnet101_features(pretrained=False,
                                 deeplab_n_features: int = REQUIRED,
                                 scales=(1.0,), dtype=jnp.float32, **kw):
    return _deeplab(deeplab_n_features, (3, 4, 23, 3), "sum", scales, dtype)


@configurable(allowlist=["deeplab_n_features", "scales"])
def deeplabv2_resnet50_features(pretrained=False,
                                deeplab_n_features: int = REQUIRED,
                                scales=(1.0,), dtype=jnp.float32, **kw):
    return _deeplab(deeplab_n_features, (3, 4, 6, 3), "sum", scales, dtype)


@configurable(allowlist=["deeplab_n_features", "scales"])
def deeplabv2_resnet101_features_multiscale(
        pretrained=False, deeplab_n_features: int = REQUIRED,
        scales=(1.0,), dtype=jnp.float32, **kw):
    return _deeplab(deeplab_n_features, (3, 4, 23, 3), "concat", scales,
                    dtype)


@configurable(allowlist=["deeplab_n_features", "scales"])
def deeplabv2_resnet50_features_multiscale(
        pretrained=False, deeplab_n_features: int = REQUIRED,
        scales=(1.0,), dtype=jnp.float32, **kw):
    return _deeplab(deeplab_n_features, (3, 4, 6, 3), "concat", scales,
                    dtype)


@configurable(allowlist=["unet_n_features", "scales"])
def unet_features(pretrained=False, unet_n_features: int = REQUIRED,
                  scales=(1.0,), dtype=jnp.float32, **kw):
    module = UNet(out_features=unet_n_features, dtype=dtype)
    return module, unet_n_features, tuple(scales)


@configurable(allowlist=["unet_n_features", "multiscale", "scales",
                         "unet_base"])
def unet_aspp_features(pretrained=False, unet_n_features: int = REQUIRED,
                       multiscale=False, scales=(1.0,), unet_base: int = 64,
                       dtype=jnp.float32, **kw):
    rates = (6, 12, 18, 24)
    module = UNetASPP(out_features=unet_n_features, rates=rates,
                      multiscale=multiscale, base=unet_base, dtype=dtype)
    out_ch = unet_n_features * (len(rates) if multiscale else 1)
    return module, out_ch, tuple(scales)


@configurable(allowlist=["deeplab_n_features", "scales"])
def deeplabv2_vgg16_features(pretrained=False,
                             deeplab_n_features: int = REQUIRED,
                             scales=(1.0,), dtype=jnp.float32, **kw):
    from scaleprotoseg_tpu.models.classic_backbones import DeepLabVGG16
    module = DeepLabVGG16(n_out=deeplab_n_features, aspp_mode="sum",
                          dtype=dtype)
    return module, deeplab_n_features, tuple(scales)


@configurable(allowlist=["deeplab_n_features", "scales"])
def deeplabv2_vgg16_features_multiscale(pretrained=False,
                                        deeplab_n_features: int = REQUIRED,
                                        scales=(1.0,), dtype=jnp.float32,
                                        **kw):
    from scaleprotoseg_tpu.models.classic_backbones import DeepLabVGG16
    module = DeepLabVGG16(n_out=deeplab_n_features, aspp_mode="concat",
                          dtype=dtype)
    return module, 4 * deeplab_n_features, tuple(scales)


@configurable(allowlist=["deeplab_n_features", "scales"])
def deeplabv2_resnet101_features_multiscaleplus(
        pretrained=False, deeplab_n_features: int = REQUIRED,
        scales=(1.0,), dtype=jnp.float32, **kw):
    """ScalePlus reconstruction (ref deeplab_features.py:159-165; the
    defining submodule file is absent upstream — see models/deeplab.py
    ASPP 'concat_plus')."""
    return _deeplab(deeplab_n_features, (3, 4, 23, 3), "concat_plus",
                    scales, dtype)


@configurable(allowlist=["deeplab_n_features", "scales",
                         "segformer_variant"])
def segformer_features_multiscale(
        pretrained=False, deeplab_n_features: int = REQUIRED,
        scales=(1.0,), segformer_variant: str = "b0", dtype=jnp.float32,
        **kw):
    """SegFormer EM backbone (ref em/module_multiscale_em.py:338-405
    usage contract; see models/segformer.py)."""
    from scaleprotoseg_tpu.models.segformer import SegFormer
    module = SegFormer(n_out=deeplab_n_features,
                       variant=segformer_variant, dtype=dtype)
    return module, 4 * deeplab_n_features, tuple(scales)


@configurable(allowlist=["deeplab_n_features", "scales"])
def deeplabv3_resnet101_features_multiscale(
        pretrained=False, deeplab_n_features: int = REQUIRED,
        scales=(1.0,), dtype=jnp.float32, **kw):
    from scaleprotoseg_tpu.models.classic_backbones import DeepLabV3Scale
    module = DeepLabV3Scale(n_out=deeplab_n_features,
                            n_blocks=(3, 4, 23, 3),
                            atrous_rates=(6, 12, 18),
                            multi_grids=(1, 2, 4), output_stride=8,
                            dtype=dtype)
    return module, 4 * deeplab_n_features, tuple(scales)


def _classic(name):
    def factory(pretrained=False, dtype=jnp.float32, **kw):
        from scaleprotoseg_tpu.models import classic_backbones as cb
        return getattr(cb, f"{name}_features")(pretrained=pretrained,
                                               dtype=dtype, **kw)
    factory.__name__ = f"{name}_features"
    return factory


base_architecture_to_features = {
    "deeplabv2_resnet101": deeplabv2_resnet101_features,
    "deeplabv2_resnet50": deeplabv2_resnet50_features,
    "deeplabv2_resnet101_multiscale": deeplabv2_resnet101_features_multiscale,
    "deeplabv2_resnet50_multiscale": deeplabv2_resnet50_features_multiscale,
    "deeplabv2_vgg16": deeplabv2_vgg16_features,
    "deeplabv2_vgg16_multiscale": deeplabv2_vgg16_features_multiscale,
    "deeplabv3_resnet101_multiscale": deeplabv3_resnet101_features_multiscale,
    "deeplabv2_resnet101_multiscaleplus":
        deeplabv2_resnet101_features_multiscaleplus,
    "segformer": segformer_features_multiscale,
    "segformer_multiscale": segformer_features_multiscale,
    "unet": unet_features,
    "unet_aspp": unet_aspp_features,
    **{name: _classic(name) for name in
       ("resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
        "vgg11", "vgg11_bn", "vgg13", "vgg13_bn", "vgg16", "vgg16_bn",
        "vgg19", "vgg19_bn", "densenet121", "densenet161", "densenet169",
        "densenet201")},
}


def _class_binding(variant: str, param: str, default):
    """Read PPNet/PPNetMultiScale class-level gin bindings
    (e.g. ``PPNetMultiScale.num_scales = 4``)."""
    name = "PPNet" if variant == "single" else "PPNetMultiScale"
    return configlib.query(name, param, default)


def construct_ppnet(
    variant: str,
    img_size: int = 224,
    base_architecture: str = REQUIRED,
    pretrained: bool = True,
    prototype_shape: Tuple[int, int, int, int] = (2000, 512, 1, 1),
    num_classes: int = 200,
    prototype_activation_function: str = "log",
    add_on_layers_type: str = "bottleneck",
    scale_head_type: Optional[str] = None,
    num_groups: Optional[int] = None,
    incorrect_strength: float = -0.5,
    dtype=jnp.float32,
) -> Tuple[PPNet, ProtoSpec]:
    """Build (model, spec).  ``variant``: 'single' | 'multiscale' | 'group'."""
    if variant not in ("single", "multiscale", "group"):
        raise ValueError(variant)
    num_scales = 1 if variant == "single" else \
        int(_class_binding(variant, "num_scales", 4))
    if variant == "group":
        num_groups = int(num_groups if num_groups is not None
                         else _class_binding(variant, "num_groups", 3))
    else:
        num_groups = 0
    bottleneck_stride = _class_binding(variant, "bottleneck_stride", None)
    if not _class_binding(variant, "patch_classification", True):
        raise NotImplementedError(
            "Only patch (per-pixel) classification is supported "
            "(ref model_multiscale.py:388)")

    backbone, out_ch, msc_scales = base_architecture_to_features[
        base_architecture](pretrained=pretrained, dtype=dtype)

    spec = ProtoSpec.equal_allocation(
        num_prototypes=prototype_shape[0], proto_depth=prototype_shape[1],
        num_classes=num_classes, num_scales=num_scales,
        num_groups=num_groups)
    if spec.feature_depth != out_ch and add_on_layers_type == "deeplab_simple":
        raise ValueError(
            f"backbone channels {out_ch} != num_scales*proto_depth "
            f"{spec.feature_depth}; check deeplab_n_features / num_scales")

    model = PPNet(
        backbone=backbone, spec=spec, backbone_channels=out_ch,
        add_on_type=add_on_layers_type,
        activation_fn=prototype_activation_function,
        grouped=(variant == "group"),
        incorrect_strength=incorrect_strength,
        msc_scales=tuple(s for s in msc_scales if s != 1.0),
        scale_head_type=scale_head_type,
        bottleneck_stride=bottleneck_stride, dtype=dtype)
    return model, spec


@configurable(name="construct_PPNet", denylist=["img_size", "variant"])
def construct_PPNet(variant: str = "multiscale", img_size: int = 224,
                    base_architecture: str = REQUIRED, pretrained: bool = True,
                    prototype_shape=(2000, 512, 1, 1), num_classes: int = 200,
                    prototype_activation_function: str = "log",
                    add_on_layers_type: str = "bottleneck",
                    scale_head_type: Optional[str] = None,
                    dtype=jnp.float32):
    return construct_ppnet(
        variant=variant, img_size=img_size,
        base_architecture=base_architecture, pretrained=pretrained,
        prototype_shape=tuple(prototype_shape), num_classes=num_classes,
        prototype_activation_function=prototype_activation_function,
        add_on_layers_type=add_on_layers_type,
        scale_head_type=scale_head_type, dtype=dtype)


@configurable(name="construct_PPNet_Group", denylist=["img_size"])
def construct_PPNet_Group(img_size: int = 224,
                          base_architecture: str = REQUIRED,
                          pretrained: bool = True,
                          prototype_shape=(2000, 512, 1, 1),
                          num_classes: int = 200,
                          prototype_activation_function: str = "log",
                          add_on_layers_type: str = "bottleneck",
                          scale_head_type: Optional[str] = None,
                          dtype=jnp.float32):
    return construct_ppnet(
        variant="group", img_size=img_size,
        base_architecture=base_architecture, pretrained=pretrained,
        prototype_shape=tuple(prototype_shape), num_classes=num_classes,
        prototype_activation_function=prototype_activation_function,
        add_on_layers_type=add_on_layers_type,
        scale_head_type=scale_head_type, dtype=dtype)
