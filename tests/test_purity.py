"""Purity-curve parity with the reference semantics
(ref eval_valid_multiscale.py:255-269): distances/logits are bilinearly
upsampled to LABEL resolution, 100 random pixels are sampled, and the
curve value at K is the percent of the K nearest prototypes (over the
whole bank) whose class matches the pixel's prediction."""

import numpy as np
import pytest

from scaleprotoseg_tpu.eval_valid_multiscale import purity_curve_update
from scaleprotoseg_tpu.ops.resize import bilinear_sample_np


def test_bilinear_sample_matches_torch_interpolate(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    arr = rng.standard_normal((7, 11, 5)).astype(np.float32)
    out_h, out_w = 23, 37
    full = F.interpolate(
        torch.from_numpy(arr).permute(2, 0, 1)[None],
        size=(out_h, out_w), mode="bilinear",
        align_corners=False)[0].permute(1, 2, 0).numpy()
    rows = rng.integers(0, out_h, size=50)
    cols = rng.integers(0, out_w, size=50)
    sampled = bilinear_sample_np(arr, rows, cols, out_h, out_w)
    np.testing.assert_allclose(sampled, full[rows, cols], rtol=1e-5,
                               atol=1e-5)


def test_purity_curve_matches_reference_loop(rng):
    """Direct port of the reference's per-image purity accumulation
    (materializing the full label-res upsample) on a tiny example."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    P, C = 12, 3
    proto_class = rng.integers(0, C, size=P)
    dists = rng.random((6, 9, P)).astype(np.float32)
    logits = rng.standard_normal((6, 9, C)).astype(np.float32)
    label_shape = (25, 33)

    seed = 123
    ours = purity_curve_update(dists, logits, proto_class, label_shape,
                               np.random.default_rng(seed),
                               n_random_pixels=100)

    # reference loop (eval_valid_multiscale.py:255-269), CHW layout
    d_up = F.interpolate(torch.from_numpy(dists).permute(2, 0, 1)[None],
                         size=label_shape, mode="bilinear",
                         align_corners=False)[0].numpy()
    l_up = F.interpolate(torch.from_numpy(logits).permute(2, 0, 1)[None],
                         size=label_shape, mode="bilinear",
                         align_corners=False)[0].numpy()
    pred = np.argmax(l_up, axis=0)
    r = np.random.default_rng(seed)
    rows = r.integers(0, label_shape[0], size=100)
    cols = r.integers(0, label_shape[1], size=100)
    sample_distances = d_up[:, rows, cols]
    sample_preds = pred[rows, cols]
    nearest = np.argsort(sample_distances, axis=0)        # (P, n)
    is_class_proto = proto_class[nearest] == sample_preds[None]
    expected = np.zeros(P)
    for k in range(P):
        nearest_k = np.sum(is_class_proto[: k + 1], axis=0) / (k + 1)
        expected[k] = nearest_k.mean() * 100
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-4)


def test_purity_curve_is_100_when_all_protos_match():
    proto_class = np.zeros(5, np.int64)
    dists = np.random.default_rng(0).random((4, 4, 5)).astype(np.float32)
    # logits always argmax to class 0
    logits = np.zeros((4, 4, 2), np.float32)
    logits[..., 0] = 1.0
    curve = purity_curve_update(dists, logits, proto_class, (8, 8),
                                np.random.default_rng(1))
    np.testing.assert_allclose(curve, 100.0)


def test_evaluator_full_split_purity_matches_host_reference(rng):
    """SegEvaluator's on-device whole-split purity accumulation equals the
    parity-tested host per-image math (purity_curve_update) image by
    image — the reference accumulates over EVERY val image
    (eval_valid_multiscale.py:165-269), not a capped prefix."""
    import jax.numpy as jnp
    from scaleprotoseg_tpu.eval.miou import SegEvaluator

    P, C = 12, 3
    B, hp, wp = 2, 6, 9
    H, W = 25, 33
    proto_class = rng.integers(0, C, size=P)
    batches = []
    for _ in range(2):  # 2 batches x 2 images = 4-image "split"
        batches.append((
            rng.random((B, hp, wp, P)).astype(np.float32) * 4,
            rng.standard_normal((B, hp, wp, C)).astype(np.float32)))

    class Dummy:
        """distances+logits arrive packed in the images tensor (the step
        is jitted: closure data would be baked in at trace time)."""

        def apply(self, variables, images, train):
            class Out:
                distances = images[..., :P]
                logits = images[..., P:]
            return Out()

    ev = SegEvaluator(Dummy(), C, proto_class=proto_class)
    targets = rng.integers(0, C + 1, (B, H, W)).astype(np.int32)
    for d, lg in batches:
        ev.update({}, np.concatenate([d, lg], axis=-1), targets)
    got = ev.result()
    assert got["purity_images"] == 4

    # host replay: same rng stream (rows then cols per image, in order)
    host_rng = np.random.default_rng(0)
    expected = np.zeros(P, np.float64)
    for d, lg in batches:
        for b in range(B):
            expected += purity_curve_update(
                d[b], lg[b], proto_class, (H, W), host_rng)
    expected /= 4
    np.testing.assert_allclose(got["top_k_purity_percent"], expected,
                               rtol=1e-4, atol=1e-3)
