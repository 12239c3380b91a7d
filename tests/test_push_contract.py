"""Push loader-contract enforcement + artifact completeness.

The push second pass re-collects winner images by running offset
(`push/push.py`), so the loader MUST be fixed-order and re-iterable —
previously only a docstring contract (round-2 VERDICT weak #5).  These
tests pin the enforcement, and check the per-prototype artifact set
matches the reference's (original image, bbox crop, self-activation
overlay, GT-masked variant, per-class dirs, bb tables —
`segmentation/push_multiscale_optimization.py:508-686`).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scaleprotoseg_tpu.models.deeplab import DeepLabV2
from scaleprotoseg_tpu.models.ppnet import PPNet
from scaleprotoseg_tpu.push.push import push_prototypes
from scaleprotoseg_tpu.spec import ProtoSpec


@pytest.fixture(scope="module")
def tiny():
    spec = ProtoSpec.equal_allocation(8, 8, num_classes=2, num_scales=4)
    backbone = DeepLabV2(n_out=8, n_blocks=(1, 1, 1, 1),
                         aspp_mode="concat")
    model = PPNet(backbone=backbone, spec=spec,
                  backbone_channels=spec.feature_depth)
    variables = dict(model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 33, 33, 3))))
    rng = np.random.default_rng(0)
    batches = [
        (rng.standard_normal((2, 33, 33, 3)).astype(np.float32),
         rng.integers(0, 3, size=(2, 33, 33)).astype(np.int32))
        for _ in range(2)
    ]
    return model, spec, variables, batches


class ListLoader:
    def __init__(self, batches, shuffle=False):
        self.batches = batches
        self.shuffle = shuffle

    def __iter__(self):
        return iter(self.batches)


class ReshufflingLoader(ListLoader):
    """Simulates a shuffle-per-epoch loader that lies about its flag."""

    def __init__(self, batches):
        super().__init__(batches, shuffle=False)
        self._epoch = 0

    def __iter__(self):
        order = self.batches if self._epoch == 0 else self.batches[::-1]
        self._epoch += 1
        return iter(order)


def test_shuffled_loader_refused(tiny):
    model, spec, variables, batches = tiny
    with pytest.raises(ValueError, match="fixed-order"):
        push_prototypes(model, variables, spec,
                        ListLoader(batches, shuffle=True),
                        log=lambda *a: None)


def test_non_reiterable_order_detected(tiny):
    model, spec, variables, batches = tiny
    with pytest.raises(RuntimeError, match="second pass"):
        push_prototypes(model, variables, spec,
                        ReshufflingLoader(batches), log=lambda *a: None)


class TailReorderingLoader(ListLoader):
    """Keeps batch 0 fixed but permutes the rest on re-iteration — the
    corruption a first-batch-only probe cannot see."""

    def __init__(self, batches):
        super().__init__(batches, shuffle=False)
        self._epoch = 0

    def __iter__(self):
        order = self.batches if self._epoch == 0 else \
            [self.batches[0]] + self.batches[1:][::-1]
        self._epoch += 1
        return iter(order)


def test_tail_reordering_detected(tiny):
    """Every batch the second pass consumes is fingerprint-checked, not
    just the first: class 1 appears only from batch 1 on, so its winner
    image forces the second pass past batch 0, where the reordered tail
    must be caught."""
    model, spec, variables, _ = tiny
    rng = np.random.default_rng(1)

    def batch(label):  # raw labels: 0=void, class c at c+1
        return (rng.standard_normal((2, 33, 33, 3)).astype(np.float32),
                np.full((2, 33, 33), label, np.int32))

    batches = [batch(1), batch(2), batch(2)]
    with pytest.raises(RuntimeError, match="second pass"):
        push_prototypes(model, variables, spec,
                        TailReorderingLoader(batches), log=lambda *a: None)


def test_artifact_set_matches_reference(tiny, tmp_path):
    model, spec, variables, batches = tiny
    out = str(tmp_path / "prototypes")
    result = push_prototypes(model, variables, spec, ListLoader(batches),
                             prototypes_dir=out, dedup=False,
                             save_artifacts=True,
                             cls2name={0: "road", 1: "car"},
                             log=lambda *a: None)
    matched = np.nonzero(result.winners >= 0)[0]
    assert len(matched) > 0
    proto_class = np.argmax(spec.class_identity, axis=1)
    names = {0: "road", 1: "car"}
    for p in matched:
        cdir = os.path.join(out, names[int(proto_class[p])])
        # the reference's per-prototype artifact family
        # (push_multiscale_optimization.py:508-686)
        for fname in (f"prototype-self-act{p}.npy",
                      f"prototype-img-original{p}.png",
                      f"prototype-img{p}.png",
                      f"prototype-img-original_with_self_act{p}.png",
                      f"prototype-img-original_gt_mask{p}.png"):
            assert os.path.exists(os.path.join(cdir, fname)), \
                (names[int(proto_class[p])], fname)
    # bound-box tables (bb*.npy, ref :311-321)
    bb = np.load(os.path.join(out, "bb.npy"))
    assert bb.shape == (spec.num_prototypes, 6)
    assert (bb[matched, 0] == result.winners[matched]).all()
    assert os.path.exists(os.path.join(out, "bb-receptive_field.npy"))
    # push records
    assert os.path.exists(os.path.join(out, "unique_prototypes.json"))
    assert os.path.exists(os.path.join(out, "push_info.npz"))
