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
