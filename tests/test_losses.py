"""Loss parity tests.

Primary golden: the reference's own torch loss implementations
(`/root/reference/segmentation/model/loss.py`), loaded directly when
torch + the reference checkout are available (skipped otherwise).
Secondary: independent numpy checks of the dense formulations.
"""

import importlib.util
import os

import numpy as np
import pytest

import jax.numpy as jnp

from scaleprotoseg_tpu.losses import (
    cross_entropy_group_loss, entropy_group_loss, entropy_sampl_loss,
    entropy_spat_loss, kld_group_loss, kld_loss, last_layer_l1, norm_loss,
    pixel_wise_cross_entropy, scale_max_loss)
from scaleprotoseg_tpu.spec import ProtoSpec

REF_LOSS = "/root/reference/segmentation/model/loss.py"
torch = pytest.importorskip("torch")
ref_available = os.path.exists(REF_LOSS)


def _load_ref_losses():
    spec = importlib.util.spec_from_file_location("ref_loss", REF_LOSS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    if not ref_available:
        pytest.skip("reference checkout not present")
    return _load_ref_losses()


def _spec():
    # 2 classes, 4 scales, 3 protos per (class, scale) -> P = 24.
    return ProtoSpec.equal_allocation(24, 8, num_classes=2, num_scales=4,
                                      num_groups=3)


def _rand_problem(rng, B=2, H=5, W=7, spec=None):
    spec = spec or _spec()
    P = spec.num_prototypes
    distances = rng.random((B, H, W, P)).astype(np.float32) * 4
    # labels: 0 void, 1..C classes; ensure variety incl. void
    targets = rng.integers(0, spec.num_classes + 1,
                           size=(B, H, W)).astype(np.int64)
    return spec, distances, targets


def _to_ref_layout(x_bhwp):
    """(B,H,W,P) -> torch (B,P,H,W)."""
    return torch.from_numpy(np.transpose(x_bhwp, (0, 3, 1, 2)))


# ---------------------------------------------------------------------------
# KLDLoss (ref loss.py:53-146)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_kld_loss_matches_reference(ref, seed):
    rng = np.random.default_rng(seed)
    spec, distances, targets = _rand_problem(rng)
    got = float(kld_loss(jnp.asarray(distances), jnp.asarray(targets), spec))

    ref_loss = ref.KLDLoss(
        prototype_class_identity=torch.from_numpy(spec.class_identity),
        num_scales=spec.num_scales,
        scale_num_prototypes=spec.scale_num_prototypes)
    expected = float(ref_loss(_to_ref_layout(distances),
                              torch.from_numpy(targets)))
    assert got == pytest.approx(expected, rel=1e-4, abs=1e-5)


def test_kld_loss_empty_when_all_void():
    spec = _spec()
    distances = np.random.rand(1, 4, 4, spec.num_prototypes).astype(np.float32)
    targets = np.zeros((1, 4, 4), np.int64)  # all void
    got = float(kld_loss(jnp.asarray(distances), jnp.asarray(targets), spec))
    assert got == 0.0


def test_kld_loss_single_pixel_class_skipped(ref):
    # One class has exactly 1 pixel -> its pairs must not contribute.
    rng = np.random.default_rng(7)
    spec, distances, targets = _rand_problem(rng)
    targets[:] = 1            # class 0 everywhere
    targets[0, 0, 0] = 2      # single pixel of class 1 in image 0
    got = float(kld_loss(jnp.asarray(distances), jnp.asarray(targets), spec))
    ref_loss = ref.KLDLoss(
        prototype_class_identity=torch.from_numpy(spec.class_identity),
        num_scales=spec.num_scales,
        scale_num_prototypes=spec.scale_num_prototypes)
    expected = float(ref_loss(_to_ref_layout(distances),
                              torch.from_numpy(targets)))
    assert got == pytest.approx(expected, rel=1e-4, abs=1e-5)


# ---------------------------------------------------------------------------
# EntropySamplLoss (ref loss.py:214-284)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("seed", [0, 3])
def test_entropy_sampl_matches_reference(ref, seed):
    rng = np.random.default_rng(seed)
    spec, acts, targets = _rand_problem(rng)
    got = float(entropy_sampl_loss(jnp.asarray(acts), jnp.asarray(targets),
                                   spec))
    ref_loss = ref.EntropySamplLoss(
        prototype_class_identity=torch.from_numpy(spec.class_identity),
        num_scales=spec.num_scales,
        scale_num_prototypes=spec.scale_num_prototypes)
    # Reference consumes flat (B*N, P) activations.
    flat = torch.from_numpy(acts.reshape(-1, spec.num_prototypes))
    expected = float(ref_loss(flat, torch.from_numpy(targets)))
    assert got == pytest.approx(expected, rel=1e-4, abs=1e-5)


# ---------------------------------------------------------------------------
# EntropySpatLoss (ref loss.py:149-211)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("seed", [0, 4])
def test_entropy_spat_matches_reference(ref, seed):
    rng = np.random.default_rng(seed)
    spec, acts, targets = _rand_problem(rng)
    got = float(entropy_spat_loss(jnp.asarray(acts), jnp.asarray(targets),
                                  spec))
    ref_loss = ref.EntropySpatLoss(
        prototype_class_identity=torch.from_numpy(spec.class_identity))
    flat = torch.from_numpy(acts.reshape(-1, spec.num_prototypes))
    expected = float(ref_loss(flat, torch.from_numpy(targets)))
    assert got == pytest.approx(expected, rel=1e-4, abs=1e-5)


# ---------------------------------------------------------------------------
# NormLoss (ref loss.py:287-348)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("norm_type", ["l1", "linf"])
def test_norm_loss_matches_reference(ref, norm_type):
    rng = np.random.default_rng(11)
    spec, acts, targets = _rand_problem(rng)
    got = float(norm_loss(jnp.asarray(acts), jnp.asarray(targets), spec,
                          norm_type=norm_type))
    ref_loss = ref.NormLoss(
        prototype_class_identity=torch.from_numpy(spec.class_identity),
        norm_type=norm_type)
    flat = torch.from_numpy(acts.reshape(-1, spec.num_prototypes))
    expected = float(ref_loss(flat, torch.from_numpy(targets)))
    assert got == pytest.approx(expected, rel=1e-4, abs=1e-5)


# ---------------------------------------------------------------------------
# Group-weight losses (EntropyGroup / CrossEntropyGroup / ScaleMax)
# ---------------------------------------------------------------------------
class _FakeGroupNet:
    """Duck-typed stand-in for the reference's ppnet in weight-only losses."""

    def __init__(self, spec, group_w):
        self.num_classes = spec.num_classes
        self.num_groups = spec.num_groups
        self.num_scales = spec.num_scales
        self.prototype_class_identity = torch.from_numpy(spec.class_identity)
        self.scale_num_prototypes = spec.scale_num_prototypes
        g = torch.from_numpy(spec.group_class_identity)
        self.group_class_identity = g
        # per-class Linear weights (G, P_c), packed over non-empty classes
        self.group_projection = []
        for c in range(spec.num_classes):
            idx = spec.class_proto_index[c]
            idx = idx[idx >= 0]
            if len(idx) == 0:
                continue
            lin = torch.nn.Linear(len(idx), spec.num_groups, bias=False)
            with torch.no_grad():
                lin.weight.copy_(torch.from_numpy(group_w[c, :, :len(idx)]))
            self.group_projection.append(lin)


def _rand_group_weights(rng, spec, simplex=True):
    w = rng.random((spec.num_classes, spec.num_groups,
                    spec.max_protos_per_class)).astype(np.float32)
    w *= spec.class_proto_mask[:, None, :]
    if simplex:
        s = w.sum(-1, keepdims=True)
        w = w / np.maximum(s, 1e-9)
    return w


def test_entropy_group_matches_reference(ref):
    rng = np.random.default_rng(5)
    spec = _spec()
    w = _rand_group_weights(rng, spec)
    got = float(entropy_group_loss(jnp.asarray(w), spec))
    fake = _FakeGroupNet(spec, w)
    expected = float(ref.EntropyGroup(fake)())
    assert got == pytest.approx(expected, rel=1e-4, abs=1e-5)


def test_cross_entropy_group_matches_reference(ref):
    rng = np.random.default_rng(6)
    spec = _spec()
    w = _rand_group_weights(rng, spec)
    got = float(cross_entropy_group_loss(jnp.asarray(w), spec))
    fake = _FakeGroupNet(spec, w)
    expected = float(ref.CrossEntropyGroup(fake)())
    assert got == pytest.approx(expected, rel=1e-4, abs=1e-5)


def test_scale_max_matches_reference(ref):
    rng = np.random.default_rng(8)
    spec = _spec()
    w = _rand_group_weights(rng, spec)
    got = float(scale_max_loss(jnp.asarray(w), spec))
    fake = _FakeGroupNet(spec, w)
    expected = float(ref.ScaleMax(fake)())
    assert got == pytest.approx(expected, rel=1e-4, abs=1e-5)


# ---------------------------------------------------------------------------
# KLDLossGroup (ref loss.py:467-545)
# ---------------------------------------------------------------------------
def test_kld_group_matches_reference(ref):
    rng = np.random.default_rng(9)
    spec = _spec()
    B, H, W = 2, 5, 7
    acts = rng.random((B, H, W, spec.num_classes,
                       spec.num_groups)).astype(np.float32) * 3
    targets = rng.integers(0, spec.num_classes + 1,
                           size=(B, H, W)).astype(np.int64)
    got = float(kld_group_loss(jnp.asarray(acts), jnp.asarray(targets), spec))

    ref_loss = ref.KLDLossGroup(
        prototype_class_identity=torch.from_numpy(spec.class_identity),
        group_class_identity=torch.from_numpy(spec.group_class_identity),
        num_groups=spec.num_groups)
    # Reference consumes a list of per-class (B*N, G) activations.
    flat = acts.reshape(-1, spec.num_classes, spec.num_groups)
    act_list = [torch.from_numpy(flat[:, c]) for c in range(spec.num_classes)]
    expected = float(ref_loss(act_list, torch.from_numpy(targets)))
    assert got == pytest.approx(expected, rel=1e-4, abs=1e-5)


# ---------------------------------------------------------------------------
# Cross entropy + L1 (ref loss.py:9-50, module_multiscale.py:257-261)
# ---------------------------------------------------------------------------
def test_pixel_wise_cross_entropy_matches_torch():
    rng = np.random.default_rng(12)
    B, H, W, C = 2, 6, 5, 4
    logits = rng.standard_normal((B, H, W, C)).astype(np.float32)
    targets = rng.integers(0, C + 1, size=(B, H, W)).astype(np.int64)
    loss, correct, valid = pixel_wise_cross_entropy(
        jnp.asarray(logits), jnp.asarray(targets), ignore_void=True)
    t = torch.from_numpy(targets).view(-1) - 1
    expected = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits).view(-1, C), t, ignore_index=-1)
    assert float(loss) == pytest.approx(float(expected), rel=1e-5)
    # correctness mask matches manual argmax comparison on valid pixels
    pred = logits.reshape(-1, C).argmax(-1)
    man_valid = (t.numpy() >= 0)
    np.testing.assert_array_equal(np.array(valid) > 0, man_valid)
    np.testing.assert_array_equal(
        np.array(correct) > 0, (pred == t.numpy()) & man_valid)


def test_last_layer_l1_off_class_only():
    spec = _spec()
    w = np.ones((spec.num_prototypes, spec.num_classes), np.float32)
    got = float(last_layer_l1(jnp.asarray(w), spec.class_identity))
    off_class = spec.num_prototypes * spec.num_classes - \
        int(spec.class_identity.sum())
    assert got == pytest.approx(off_class)
