"""Zenodo-checkpoint conversion rehearsal.

Builds a torch model with the reference's whole-module structure
(MSC(base=DeepLabV2Scale) + sigmoid add-on + prototype bank + last
layer + the reference's module attributes), pickles it with the missing
``deeplab_pytorch`` module names, converts via the stub-unpickling
converter CLI path, loads the result into our PPNet, and checks the
*forward outputs* agree with a torch-side computation — the same flow a
real Zenodo checkpoint takes.
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


def _build_reference_style_module():
    torch.manual_seed(0)
    spec = ProtoSpec.equal_allocation(24, 8, num_classes=3, num_scales=4)

    class MSC(nn.Module):
        def __init__(self, base):
            super().__init__()
            self.base = base
            self.scales = []

    class PPNetMultiScale(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = MSC(build_torch_deeplab(
                n_blocks=(1, 1, 1, 1), n_out=8, concat=True))
            self.add_on_layers = nn.Sequential(nn.Sigmoid())
            self.prototype_vectors = nn.Parameter(torch.rand(24, 8, 1, 1))
            self.last_layer = nn.Linear(24, 3, bias=False)
            self.ones = nn.Parameter(torch.ones(24, 8, 1, 1),
                                     requires_grad=False)
            # reference module attributes (survive pickling)
            self.num_scales = 4
            self.scale_num_prototypes = {s: (s * 6, (s + 1) * 6)
                                         for s in range(4)}
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


def _torch_forward(model, x_nchw):
    with torch.no_grad():
        feats = model.features.base(x_nchw)          # (N, 32, h, w)
        feats = torch.sigmoid(feats)
        n, c, h, w = feats.shape
        fs = feats.view(n, 4, 8, h, w)
        protos = model.prototype_vectors.view(24, 8)
        dists = []
        for s in range(4):
            xs = fs[:, s]                            # (N, 8, h, w)
            ps = protos[s * 6:(s + 1) * 6]
            x2 = (xs ** 2).sum(1, keepdim=True)
            cross = torch.einsum("nchw,pc->nphw", xs, ps)
            p2 = (ps ** 2).sum(1)[None, :, None, None]
            dists.append(torch.relu(x2 - 2 * cross + p2))
        d = torch.cat(dists, 1)                      # (N, 24, h, w)
        act = torch.log((d + 1) / (d + 1e-4))
        logits = torch.einsum("nphw,cp->nhwc", act,
                              model.last_layer.weight)
        return logits.numpy(), d.permute(0, 2, 3, 1).numpy()


def test_reference_group_pickle_roundtrip(tmp_path):
    """Grouped (flagship) variant: per-class Linear group projections +
    packed group last layer survive conversion with output parity."""
    torch.manual_seed(1)
    spec = ProtoSpec.equal_allocation(24, 8, num_classes=3, num_scales=4,
                                      num_groups=3)
    model, _ = _build_reference_style_module()
    # graft the group head onto the pickled module, reference-style
    del model.last_layer
    model.num_groups = 3
    model.incorrect_strength = -0.5
    model.group_projection = nn.ModuleList(
        [nn.Linear(8, 3, bias=False) for _ in range(3)])
    model.last_layer_group = nn.Linear(9, 3, bias=False)
    src = tmp_path / "final-group.pth"
    torch.save(model, str(src))
    for name in ("segmentation.utils",
                 "segmentation.model.model_multiscale", "segmentation",
                 "segmentation.model", "deeplab_pytorch",
                 "deeplab_pytorch.libs", "deeplab_pytorch.libs.models",
                 "deeplab_pytorch.libs.models.deeplabv2_multiscale"):
        sys.modules.pop(name, None)

    dst = tmp_path / "final-group.ckpt"
    convert_reference(str(src), str(dst))
    params, batch_stats, meta = load_checkpoint(str(dst))
    cspec = spec_from_meta(meta["spec"])
    assert meta["extra"]["variant"] == "group"
    assert cspec.num_groups == 3

    jmodel = PPNet(
        backbone=DeepLabV2(n_out=8, n_blocks=(1, 1, 1, 1),
                           aspp_mode="concat"),
        spec=cspec, backbone_channels=32, grouped=True)
    x = np.random.default_rng(1).standard_normal(
        (1, 33, 33, 3)).astype(np.float32)
    variables = {"params": jax.tree.map(jnp.asarray, params),
                 "batch_stats": jax.tree.map(jnp.asarray, batch_stats)}
    out = jmodel.apply(variables, jnp.asarray(x))

    # torch-side grouped forward
    _, exp_dists = _torch_forward_distances_only(model, x)
    act = np.log((exp_dists + 1) / (exp_dists + 1e-4))
    flat = act.reshape(-1, 24)
    group_outs = []
    with torch.no_grad():
        for c in range(3):
            idx = np.nonzero(cspec.class_identity[:, c])[0]
            g = model.group_projection[c](
                torch.from_numpy(flat[:, idx]))
            group_outs.append(torch.exp(g))
        cat = torch.cat(group_outs, dim=-1)
        exp_logits = model.last_layer_group(cat).numpy().reshape(
            1, *exp_dists.shape[1:3], 3)
    np.testing.assert_allclose(np.asarray(out.logits), exp_logits,
                               rtol=2e-3, atol=2e-3)


def _torch_forward_distances_only(model, x_nhwc):
    x_nchw = torch.from_numpy(x_nhwc).permute(0, 3, 1, 2)
    with torch.no_grad():
        feats = torch.sigmoid(model.features.base(x_nchw))
        n, c, h, w = feats.shape
        fs = feats.view(n, 4, 8, h, w)
        protos = model.prototype_vectors.view(24, 8)
        dists = []
        for s in range(4):
            xs = fs[:, s]
            ps = protos[s * 6:(s + 1) * 6]
            x2 = (xs ** 2).sum(1, keepdim=True)
            cross = torch.einsum("nchw,pc->nphw", xs, ps)
            p2 = (ps ** 2).sum(1)[None, :, None, None]
            dists.append(torch.relu(x2 - 2 * cross + p2))
        d = torch.cat(dists, 1)
    return None, d.permute(0, 2, 3, 1).numpy()


def test_reference_pickle_roundtrip(tmp_path):
    model, _ = _build_reference_style_module()
    src = tmp_path / "push_final.pth"
    torch.save(model, str(src))
    # remove the fake packages: loading must go through the stub unpickler
    for name in ("segmentation.utils",
                 "segmentation.model.model_multiscale", "segmentation",
                 "segmentation.model", "deeplab_pytorch",
                 "deeplab_pytorch.libs", "deeplab_pytorch.libs.models",
                 "deeplab_pytorch.libs.models.deeplabv2_multiscale"):
        sys.modules.pop(name, None)

    dst = tmp_path / "push_final.ckpt"
    convert_reference(str(src), str(dst))

    params, batch_stats, meta = load_checkpoint(str(dst))
    spec = spec_from_meta(meta["spec"])
    assert spec.num_prototypes == 24 and spec.num_scales == 4
    assert meta["extra"]["variant"] == "multiscale"

    jmodel = PPNet(
        backbone=DeepLabV2(n_out=8, n_blocks=(1, 1, 1, 1),
                           aspp_mode="concat"),
        spec=spec, backbone_channels=32)
    x = np.random.default_rng(0).standard_normal(
        (1, 65, 65, 3)).astype(np.float32)
    variables = {"params": jax.tree.map(jnp.asarray, params),
                 "batch_stats": jax.tree.map(jnp.asarray, batch_stats)}
    out = jmodel.apply(variables, jnp.asarray(x))

    exp_logits, exp_dists = _torch_forward(
        model, torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(out.distances), exp_dists,
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.logits), exp_logits,
                               rtol=2e-3, atol=2e-3)
