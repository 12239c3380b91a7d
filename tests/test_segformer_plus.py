"""Shape + optimizer-group tests for the reconstructed backbones:
SegFormer EM branch (ref em/module_multiscale_em.py:338-405) and
DeepLabV2 multiscaleplus (ref deeplab_features.py:159-165)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from scaleprotoseg_tpu.models.factory import base_architecture_to_features


@pytest.mark.slow  # 40 s MiT compile on 1 core
def test_segformer_multiscale_shapes():
    factory = base_architecture_to_features["segformer_multiscale"]
    module, out_ch, scales = factory(deeplab_n_features=8)
    assert out_ch == 32
    x = jnp.zeros((1, 64, 64, 3))
    variables = module.init(jax.random.PRNGKey(0), x)
    y = module.apply(variables, x)
    # stride-8 grid, 4 concatenated scales (fine -> coarse)
    assert y.shape == (1, 8, 8, 32)
    # the usage contract's two param groups exist under the right names
    assert "segformer" in variables["params"]
    assert "decode_head" in variables["params"]


def test_segformer_optimizer_groups():
    """decode_head params land in the ASPP groups (warm-up trainable,
    10x joint lr); the encoder in features_conv — the EM module's
    generalized param selection."""
    from flax import traverse_util
    from scaleprotoseg_tpu.train.optim import label_params

    factory = base_architecture_to_features["segformer_multiscale"]
    module, _, _ = factory(deeplab_n_features=8)
    # only the param-tree structure matters: eval_shape skips the
    # 30s+ compile of the full MiT init on this host
    variables = jax.eval_shape(
        lambda k: module.init(k, jnp.zeros((1, 32, 32, 3))),
        jax.random.PRNGKey(0))
    labels = traverse_util.flatten_dict(
        label_params({"backbone": variables["params"]}))
    decode = {k: v for k, v in labels.items() if "decode_head" in k}
    encoder = {k: v for k, v in labels.items() if "segformer" in k}
    assert decode and encoder
    assert set(decode.values()) == {"aspp_w", "aspp_b"}
    assert set(encoder.values()) == {"features_conv"}


def test_segformer_ppnet_structure():
    """Fast twin of the e2e test: the assembled SegFormer-PPNet's output
    shapes and param-tree surface via eval_shape (no MiT compile)."""
    import scaleprotoseg_tpu.configlib as configlib
    from scaleprotoseg_tpu.models.factory import construct_ppnet

    configlib.clear_config()
    configlib.parse_config("""
segformer_features_multiscale.deeplab_n_features = 8
segformer_features_multiscale.scales = []
PPNetMultiScale.num_scales = 4
PPNetMultiScale.patch_classification = True
""")
    model, spec = construct_ppnet(
        variant="multiscale", base_architecture="segformer_multiscale",
        pretrained=False, prototype_shape=(24, 8, 1, 1), num_classes=3,
        add_on_layers_type="deeplab_simple")
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.eval_shape(
        lambda k: model.init(k, x), jax.random.PRNGKey(0))
    out = jax.eval_shape(
        lambda v: model.apply(v, x, train=False), variables)
    assert out.logits.shape == (1, 8, 8, 3)
    assert out.distances.shape == (1, 8, 8, 24)
    assert {"backbone", "prototype_vectors", "last_layer"} <= \
        set(variables["params"].keys())
    configlib.clear_config()


@pytest.mark.slow  # ~40 s MiT compile on 1 core; structure twin above
def test_segformer_ppnet_end_to_end():
    import scaleprotoseg_tpu.configlib as configlib
    from scaleprotoseg_tpu.models.factory import construct_ppnet

    configlib.clear_config()
    configlib.parse_config("""
segformer_features_multiscale.deeplab_n_features = 8
segformer_features_multiscale.scales = []
PPNetMultiScale.num_scales = 4
PPNetMultiScale.patch_classification = True
""")
    model, spec = construct_ppnet(
        variant="multiscale", base_architecture="segformer_multiscale",
        pretrained=False, prototype_shape=(24, 8, 1, 1), num_classes=3,
        add_on_layers_type="deeplab_simple")
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x, train=False)
    assert out.logits.shape == (1, 8, 8, 3)
    assert out.distances.shape == (1, 8, 8, 24)
    assert np.isfinite(np.asarray(out.logits)).all()


def test_multiscaleplus_shapes():
    factory = base_architecture_to_features[
        "deeplabv2_resnet101_multiscaleplus"]
    module, out_ch, _ = factory(deeplab_n_features=8)
    assert out_ch == 32
    import dataclasses
    module = dataclasses.replace(module, n_blocks=(1, 1, 1, 1))
    x = jnp.zeros((1, 65, 65, 3))
    variables = module.init(jax.random.PRNGKey(0), x)
    y = module.apply(variables, x)
    assert y.shape == (1, 9, 9, 32)
    # the plus head adds per-branch image-level context projections
    aspp = variables["params"]["aspp"]
    assert {"c0", "c1", "c2", "c3", "c0_pool", "c1_pool", "c2_pool",
            "c3_pool"} <= set(aspp.keys())
    # context params belong to the ASPP optimizer groups
    from flax import traverse_util
    from scaleprotoseg_tpu.train.optim import label_params
    labels = traverse_util.flatten_dict(
        label_params({"backbone": variables["params"]}))
    pool_labels = {v for k, v in labels.items() if "_pool" in "/".join(k)}
    assert pool_labels == {"aspp_w", "aspp_b"}
