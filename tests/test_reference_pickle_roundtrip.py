"""Zenodo-checkpoint conversion rehearsal.

Builds torch models with the reference's whole-module structure
(MSC(base=DeepLabV2Scale) + sigmoid add-on + prototype bank + last
layer / group head + the reference's module attributes), pickles them
with the missing ``deeplab_pytorch`` module names, converts via the
stub-unpickling converter CLI path, loads the result into our PPNet, and
checks the *forward outputs* agree with a torch-side computation — the
same flow a real Zenodo checkpoint takes.

Covers (VERDICT r1 item 3):
- toy-scale multiscale + grouped round trips (fast regression tests),
- the FLAGSHIP-scale rehearsal: ResNet-101 (3,4,23,3), (228, 64) bank,
  19 classes, grouped head, 513x513 input — so a real Zenodo file is a
  path away, not a debugging session away,
- a pruned (irregular-spec) pickle: reference-style surgery
  (`model_multiscale.py:400-432`) before pickling.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
nn = torch.nn

from test_torch_convert import build_torch_deeplab  # noqa: E402

from scaleprotoseg_tpu.checkpoints.io import load_checkpoint  # noqa: E402
from scaleprotoseg_tpu.checkpoints.io import spec_from_meta  # noqa: E402
from scaleprotoseg_tpu.convert_checkpoint import convert_reference  # noqa: E402
from scaleprotoseg_tpu.models.deeplab import DeepLabV2  # noqa: E402
from scaleprotoseg_tpu.models.ppnet import PPNet  # noqa: E402
from scaleprotoseg_tpu.spec import ProtoSpec  # noqa: E402

FAKE_MODULES = ("segmentation.utils",
                "segmentation.model.model_multiscale", "segmentation",
                "segmentation.model", "deeplab_pytorch",
                "deeplab_pytorch.libs", "deeplab_pytorch.libs.models",
                "deeplab_pytorch.libs.models.deeplabv2_multiscale")


def _build_reference_style_module(num_prototypes=24, proto_depth=8,
                                  num_classes=3, n_blocks=(1, 1, 1, 1),
                                  n_out=8, seed=0):
    torch.manual_seed(seed)
    spec = ProtoSpec.equal_allocation(num_prototypes, proto_depth,
                                      num_classes=num_classes, num_scales=4)

    class MSC(nn.Module):
        def __init__(self, base):
            super().__init__()
            self.base = base
            self.scales = []

    class PPNetMultiScale(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = MSC(build_torch_deeplab(
                n_blocks=n_blocks, n_out=n_out, concat=True))
            self.add_on_layers = nn.Sequential(nn.Sigmoid())
            self.prototype_vectors = nn.Parameter(
                torch.rand(num_prototypes, proto_depth, 1, 1))
            self.last_layer = nn.Linear(num_prototypes, num_classes,
                                        bias=False)
            self.ones = nn.Parameter(
                torch.ones(num_prototypes, proto_depth, 1, 1),
                requires_grad=False)
            # reference module attributes (survive pickling)
            self.num_scales = 4
            self.scale_num_prototypes = {
                s: tuple(spec.scale_bounds[s]) for s in range(4)}
            self.prototype_class_identity = torch.from_numpy(
                spec.class_identity)
            self.epsilon = 1e-4
            self.patch_classification = True

    # pretend the classes come from the (missing) reference packages
    for pkg in ("segmentation", "segmentation.model"):
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = []
            sys.modules[pkg] = m
    for cls, modname in ((MSC, "segmentation.utils"),
                         (PPNetMultiScale,
                          "segmentation.model.model_multiscale")):
        mod = types.ModuleType(modname)
        setattr(mod, cls.__name__, cls)
        cls.__module__ = modname
        cls.__qualname__ = cls.__name__
        sys.modules[modname] = mod
        parent, _, child = modname.rpartition(".")
        setattr(sys.modules[parent], child, mod)
    model = PPNetMultiScale()
    # the torch deeplab mirror class is local to its factory; give it the
    # missing-submodule identity so pickling/unpickling exercises stubs
    base_cls = type(model.features.base)
    base_modname = "deeplab_pytorch.libs.models.deeplabv2_multiscale"
    for pkg in ("deeplab_pytorch", "deeplab_pytorch.libs",
                "deeplab_pytorch.libs.models"):
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = []
            sys.modules[pkg] = m
    base_mod = types.ModuleType(base_modname)
    base_cls.__module__ = base_modname
    base_cls.__qualname__ = "DeepLabV2"
    base_cls.__name__ = "DeepLabV2"
    setattr(base_mod, "DeepLabV2", base_cls)
    sys.modules[base_modname] = base_mod
    setattr(sys.modules["deeplab_pytorch.libs.models"],
            "deeplabv2_multiscale", base_mod)
    model.eval()
    return model, spec


def _pop_fake_modules():
    for name in FAKE_MODULES:
        sys.modules.pop(name, None)


def _torch_distances(model, x_nhwc, spec):
    """Reference-semantics distances (B, h, w, P) from the pickled module,
    honoring irregular per-scale ranges."""
    x_nchw = torch.from_numpy(x_nhwc).permute(0, 3, 1, 2)
    d_model = spec.proto_depth
    with torch.no_grad():
        feats = torch.sigmoid(model.features.base(x_nchw))
        n, c, h, w = feats.shape
        fs = feats.view(n, 4, d_model, h, w)
        protos = model.prototype_vectors.view(-1, d_model)
        dists = []
        for s in range(4):
            lo, hi = model.scale_num_prototypes[s]
            xs = fs[:, s]
            ps = protos[lo:hi]
            x2 = (xs ** 2).sum(1, keepdim=True)
            cross = torch.einsum("nchw,pc->nphw", xs, ps)
            p2 = (ps ** 2).sum(1)[None, :, None, None]
            dists.append(torch.relu(x2 - 2 * cross + p2))
        d = torch.cat(dists, 1)
    return d.permute(0, 2, 3, 1).numpy()


def _torch_logits_last_layer(model, dists):
    act = np.log((dists + 1) / (dists + 1e-4))
    with torch.no_grad():
        w = model.last_layer.weight.numpy()
    return np.einsum("nhwp,cp->nhwc", act, w)


def _torch_logits_grouped(model, dists, spec):
    act = np.log((dists + 1) / (dists + 1e-4))
    # distances carry only scale-covered prototypes (== num_prototypes
    # except on floor-division-leftover banks)
    flat = act.reshape(-1, spec.num_active_prototypes)
    group_outs = []
    with torch.no_grad():
        for c in range(spec.num_classes):
            idx = np.nonzero(spec.class_identity[:, c])[0]
            g = model.group_projection[c](
                torch.from_numpy(flat[:, idx]).float())
            group_outs.append(torch.exp(g))
        cat = torch.cat(group_outs, dim=-1)
        logits = model.last_layer_group(cat).numpy()
    return logits.reshape(dists.shape[:3] + (spec.num_classes,))


def _graft_group_head(model, spec, num_groups=3, seed=1):
    torch.manual_seed(seed)
    del model.last_layer
    model.num_groups = num_groups
    model.incorrect_strength = -0.5
    model.group_projection = nn.ModuleList(
        [nn.Linear(int(spec.class_counts[c]), num_groups, bias=False)
         for c in range(spec.num_classes)])
    model.last_layer_group = nn.Linear(
        spec.num_classes * num_groups, spec.num_classes, bias=False)
    return model


def _roundtrip(model, tmp_path, name):
    src = tmp_path / f"{name}.pth"
    torch.save(model, str(src))
    _pop_fake_modules()
    dst = tmp_path / f"{name}.ckpt"
    convert_reference(str(src), str(dst))
    params, batch_stats, meta = load_checkpoint(str(dst))
    return params, batch_stats, meta


def _jax_variables(params, batch_stats):
    variables = {"params": jax.tree.map(jnp.asarray, params)}
    if batch_stats:
        variables["batch_stats"] = jax.tree.map(jnp.asarray, batch_stats)
    return variables


def test_reference_pickle_roundtrip(tmp_path):
    model, _ = _build_reference_style_module()
    params, batch_stats, meta = _roundtrip(model, tmp_path, "push_final")
    spec = spec_from_meta(meta["spec"])
    assert spec.num_prototypes == 24 and spec.num_scales == 4
    assert meta["extra"]["variant"] == "multiscale"

    jmodel = PPNet(
        backbone=DeepLabV2(n_out=8, n_blocks=(1, 1, 1, 1),
                           aspp_mode="concat"),
        spec=spec, backbone_channels=32)
    x = np.random.default_rng(0).standard_normal(
        (1, 65, 65, 3)).astype(np.float32)
    out = jmodel.apply(_jax_variables(params, batch_stats), jnp.asarray(x))

    exp_dists = _torch_distances(model, x, spec)
    exp_logits = _torch_logits_last_layer(model, exp_dists)
    np.testing.assert_allclose(np.asarray(out.distances), exp_dists,
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.logits), exp_logits,
                               rtol=2e-3, atol=2e-3)


def test_reference_group_pickle_roundtrip(tmp_path):
    """Grouped variant (toy scale): per-class Linear group projections +
    packed group last layer survive conversion with output parity."""
    model, spec0 = _build_reference_style_module()
    model = _graft_group_head(model, spec0)
    params, batch_stats, meta = _roundtrip(model, tmp_path, "final-group")
    cspec = spec_from_meta(meta["spec"])
    assert meta["extra"]["variant"] == "group"
    assert cspec.num_groups == 3

    jmodel = PPNet(
        backbone=DeepLabV2(n_out=8, n_blocks=(1, 1, 1, 1),
                           aspp_mode="concat"),
        spec=cspec, backbone_channels=32, grouped=True)
    x = np.random.default_rng(1).standard_normal(
        (1, 33, 33, 3)).astype(np.float32)
    out = jmodel.apply(_jax_variables(params, batch_stats), jnp.asarray(x))

    exp_dists = _torch_distances(model, x, cspec)
    exp_logits = _torch_logits_grouped(model, exp_dists, cspec)
    np.testing.assert_allclose(np.asarray(out.logits), exp_logits,
                               rtol=2e-3, atol=2e-3)


def test_leftover_bank_group_pickle_roundtrip(tmp_path):
    """The group_scaleproto_coco regime at toy scale: P % num_scales != 0
    leaves bank rows outside every scale range (2054 -> 4 x 513 upstream;
    10 -> 4 x 2 here).  The real Zenodo COCO-group checkpoints have this
    exact layout, so the conversion chain must carry it: distances are
    active-width, danglers convert to class -1, and outputs match the
    reference-semantics torch computation."""
    model, spec0 = _build_reference_style_module(num_prototypes=10,
                                                 proto_depth=8,
                                                 num_classes=2)
    assert spec0.num_active_prototypes == 8
    model = _graft_group_head(model, spec0, num_groups=2)
    params, batch_stats, meta = _roundtrip(model, tmp_path,
                                           "final-group-leftover")
    cspec = spec_from_meta(meta["spec"])
    assert cspec.num_prototypes == 10
    assert cspec.num_active_prototypes == 8
    assert cspec.class_ids[8:] == (-1, -1)

    jmodel = PPNet(
        backbone=DeepLabV2(n_out=8, n_blocks=(1, 1, 1, 1),
                           aspp_mode="concat"),
        spec=cspec, backbone_channels=32, grouped=True)
    x = np.random.default_rng(2).standard_normal(
        (1, 33, 33, 3)).astype(np.float32)
    out = jmodel.apply(_jax_variables(params, batch_stats), jnp.asarray(x))
    assert out.distances.shape[-1] == 8

    exp_dists = _torch_distances(model, x, cspec)
    exp_logits = _torch_logits_grouped(model, exp_dists, cspec)
    np.testing.assert_allclose(np.asarray(out.logits), exp_logits,
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_flagship_scale_conversion_parity(tmp_path):
    """FLAGSHIP rehearsal: the full Cityscapes grouped ScaleProtoSeg —
    ResNet-101 (3,4,23,3) concat-ASPP, (228, 64) bank, 19 classes, 3
    groups — pickled reference-style, converted, and forward-matched at
    513x513 within fp32 tolerance (VERDICT r1 item 3; matches the Zenodo
    `final-group.pth` layout, /root/reference/README.md:100)."""
    model, spec0 = _build_reference_style_module(
        num_prototypes=228, proto_depth=64, num_classes=19,
        n_blocks=(3, 4, 23, 3), n_out=64, seed=2)
    model = _graft_group_head(model, spec0)
    params, batch_stats, meta = _roundtrip(model, tmp_path, "final-group")
    cspec = spec_from_meta(meta["spec"])
    assert meta["extra"]["variant"] == "group"
    assert cspec.num_prototypes == 228 and cspec.num_classes == 19
    assert cspec.proto_depth == 64 and cspec.num_groups == 3

    jmodel = PPNet(
        backbone=DeepLabV2(n_out=64, n_blocks=(3, 4, 23, 3),
                           aspp_mode="concat"),
        spec=cspec, backbone_channels=256, grouped=True)
    x = np.random.default_rng(2).standard_normal(
        (1, 513, 513, 3)).astype(np.float32)
    out = jmodel.apply(_jax_variables(params, batch_stats), jnp.asarray(x))

    exp_dists = _torch_distances(model, x, cspec)
    exp_logits = _torch_logits_grouped(model, exp_dists, cspec)
    got_logits = np.asarray(out.logits)
    assert got_logits.shape == exp_logits.shape == (1, 65, 65, 19)
    # fp32 tolerance at 101 layers of depth: scale-relative bounds
    np.testing.assert_allclose(np.asarray(out.distances), exp_dists,
                               rtol=5e-3, atol=5e-3)
    scale = np.abs(exp_logits).max()
    np.testing.assert_allclose(got_logits, exp_logits, rtol=1e-2,
                               atol=1e-2 * scale)


def test_pruned_irregular_spec_conversion(tmp_path):
    """A pushed/pruned pickle: reference-style surgery
    (`model_multiscale.py:400-432` — bank/last-layer slicing + re-packed
    scale ranges + sliced class identity) yields an IRREGULAR spec that
    must convert and forward-match."""
    model, spec0 = _build_reference_style_module(seed=3)
    to_prune = [0, 5, 7, 13, 18, 23]
    keep = [i for i in range(spec0.num_prototypes) if i not in to_prune]
    with torch.no_grad():
        model.prototype_vectors = nn.Parameter(
            model.prototype_vectors.data[keep])
        model.last_layer.weight.data = model.last_layer.weight.data[:, keep]
        model.ones = nn.Parameter(model.ones.data[keep],
                                  requires_grad=False)
        model.prototype_class_identity = \
            model.prototype_class_identity[keep, :]
    pos = 0
    new_ranges = {}
    for s, (lo, hi) in enumerate(spec0.scale_bounds):
        n_kept = sum(1 for i in keep if lo <= i < hi)
        new_ranges[s] = (pos, pos + n_kept)
        pos += n_kept
    model.scale_num_prototypes = new_ranges

    params, batch_stats, meta = _roundtrip(model, tmp_path, "pruned")
    cspec = spec_from_meta(meta["spec"])
    assert cspec.num_prototypes == len(keep)
    assert not cspec.is_regular
    expected_spec = spec0.prune(to_prune)
    assert cspec.class_ids == expected_spec.class_ids
    assert cspec.scale_bounds == expected_spec.scale_bounds

    jmodel = PPNet(
        backbone=DeepLabV2(n_out=8, n_blocks=(1, 1, 1, 1),
                           aspp_mode="concat"),
        spec=cspec, backbone_channels=32)
    x = np.random.default_rng(3).standard_normal(
        (1, 65, 65, 3)).astype(np.float32)
    out = jmodel.apply(_jax_variables(params, batch_stats), jnp.asarray(x))
    exp_dists = _torch_distances(model, x, cspec)
    exp_logits = _torch_logits_last_layer(model, exp_dists)
    np.testing.assert_allclose(np.asarray(out.distances), exp_dists,
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.logits), exp_logits,
                               rtol=2e-3, atol=2e-3)


def test_convert_checkpoint_cli_chain(tmp_path, monkeypatch):
    """The documented Zenodo command chain, end-to-end at toy scale:
    ``python -m scaleprotoseg_tpu.convert_checkpoint reference <pth>
    results/<run>/checkpoints/<phase>.ckpt`` followed by the eval CLI's
    checkpoint resolution + model rebuild + forward.  (Flagship-scale
    numerics are covered by test_flagship_scale_conversion_parity.)"""
    import sys

    from scaleprotoseg_tpu import convert_checkpoint
    from scaleprotoseg_tpu.model_loading import (load_model,
                                                 resolve_checkpoint)

    model, _ = _build_reference_style_module()
    src = tmp_path / "push_final.pth"
    torch.save(model, str(src))
    _pop_fake_modules()
    run_dir = tmp_path / "results" / "zenodo_run"
    dst = run_dir / "checkpoints" / "push_final.ckpt"
    dst.parent.mkdir(parents=True)

    monkeypatch.setattr(sys, "argv", [
        "convert_checkpoint", "reference", str(src), str(dst)])
    convert_checkpoint.main()
    assert resolve_checkpoint(str(run_dir), "push_final") == str(dst)

    # the toy module's architecture is not a shipped config: write the
    # run config the way a user would for their checkpoint's experiment
    (run_dir / "config.gin").write_text("""
construct_PPNet.base_architecture = 'tiny_deeplab_test'
construct_PPNet.prototype_shape = (24, 8, 1, 1)
construct_PPNet.num_classes = 3
construct_PPNet.add_on_layers_type = 'deeplab_simple'
""")
    from scaleprotoseg_tpu.models.factory import (
        base_architecture_to_features)
    base_architecture_to_features["tiny_deeplab_test"] = \
        lambda pretrained, dtype: (DeepLabV2(
            n_out=8, n_blocks=(1, 1, 1, 1), aspp_mode="concat",
            dtype=dtype), 32, ())
    try:
        jmodel, spec, variables = load_model(str(run_dir), str(dst))
        out = jmodel.apply(variables, jnp.zeros((1, 65, 65, 3)))
        assert out.logits.shape == (1, 9, 9, spec.num_classes)
    finally:
        base_architecture_to_features.pop("tiny_deeplab_test")


def test_convert_checkpoint_cli_installs_config(tmp_path, monkeypatch):
    """--config installs the named experiment gin as the run's
    config.gin (the converted run never trained here, so eval needs it
    to rebuild the model)."""
    import sys

    from scaleprotoseg_tpu import convert_checkpoint

    model, _ = _build_reference_style_module()
    src = tmp_path / "final-group.pth"
    torch.save(model, str(src))
    _pop_fake_modules()
    run_dir = tmp_path / "results" / "zr"
    dst = run_dir / "checkpoints" / "final-group.ckpt"
    dst.parent.mkdir(parents=True)
    monkeypatch.setattr(sys, "argv", [
        "convert_checkpoint", "reference", str(src), str(dst),
        "--config", "group_scaleproto_cityscapes"])
    convert_checkpoint.main()
    cfg = (run_dir / "config.gin").read_text()
    assert "construct_PPNet_Group" in cfg


def test_export_torch_roundtrip(tmp_path):
    """The way back (convert_checkpoint export-torch): a framework
    checkpoint exports to a reference-named torch state dict that (a)
    equals the original module's tensors bit-for-bit after the full
    torch -> jax -> torch loop, and (b) load_state_dict's into a FRESH
    reference-style module, reproducing the original's outputs."""
    from scaleprotoseg_tpu.convert_checkpoint import export_torch

    model, spec0 = _build_reference_style_module()
    model = _graft_group_head(model, spec0)
    _, _, meta = _roundtrip(model, tmp_path, "final-group")
    sd_path = tmp_path / "final-group_sd.pth"
    export_torch(str(tmp_path / "final-group.ckpt"), str(sd_path))
    exported = torch.load(str(sd_path), weights_only=True)

    orig = {k: v.detach().cpu().numpy()
            for k, v in model.state_dict().items()}
    # "ones" is the reference's constant L2 helper buffer — rebuilt by
    # its constructor, never converted in either direction
    expect_keys = {k for k in orig if k != "ones"}
    assert set(exported) == expect_keys
    for k in sorted(expect_keys):
        np.testing.assert_array_equal(
            exported[k].numpy(), orig[k],
            err_msg=f"roundtrip mismatch at {k}")

    # loads into a fresh reference-style module and reproduces outputs
    fresh, _ = _build_reference_style_module(seed=99)
    fresh = _graft_group_head(fresh, spec0, seed=98)
    missing, unexpected = fresh.load_state_dict(exported, strict=False)
    assert list(missing) == ["ones"] and not unexpected
    _pop_fake_modules()
    x = np.random.default_rng(5).standard_normal(
        (1, 33, 33, 3)).astype(np.float32)
    cspec = spec_from_meta(meta["spec"])
    d0 = _torch_distances(model, x, cspec)
    d1 = _torch_distances(fresh, x, cspec)
    np.testing.assert_allclose(d1, d0, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(_torch_logits_grouped(fresh, d1, cspec),
                               _torch_logits_grouped(model, d0, cspec),
                               rtol=1e-5, atol=1e-5)
