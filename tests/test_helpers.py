"""helpers.py parity tests (activation-crop bboxes)."""

import numpy as np

from scaleprotoseg_tpu.helpers import (find_continuous_high_activation_crop,
                                       find_high_activation_crop,
                                       list_of_distances)


def test_find_high_activation_crop():
    act = np.zeros((10, 12))
    act[3:6, 4:9] = 5.0
    y0, y1, x0, x1 = find_high_activation_crop(act, percentile=95)
    assert (y0, y1, x0, x1) == (3, 6, 4, 9)


def test_find_continuous_high_activation_crop_grows_region():
    act = np.zeros((20, 20))
    act[5:15, 5:15] = 1.0
    # start from a small patch inside the region
    bbox = find_continuous_high_activation_crop(
        act, (8, 10, 8, 10), threshold=0.5, add_margin=0)
    assert bbox == (5, 15, 5, 15)
    # margin clamps to image bounds
    bbox = find_continuous_high_activation_crop(
        act, (8, 10, 8, 10), threshold=0.5, add_margin=100)
    assert bbox == (0, 20, 0, 20)


def test_find_continuous_crop_parity_vs_reference():
    """Fuzz the direction-table rewrite against the reference's greedy
    4-direction loop (`helpers.py:53-87`, imported directly)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_helpers", "/root/reference/helpers.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    rng = np.random.default_rng(0)
    for _ in range(50):
        h, w = rng.integers(4, 24, 2)
        act = rng.random((h, w))
        act[act < 0.45] = 0.0  # sparse blobs so frontiers actually stop
        y0 = int(rng.integers(0, h - 1))
        y1 = int(rng.integers(y0, h - 1))
        x0 = int(rng.integers(0, w - 1))
        x1 = int(rng.integers(x0, w - 1))
        margin = int(rng.integers(0, 4))
        ours = find_continuous_high_activation_crop(
            act, (y0, y1, x0, x1), threshold=0.5, add_margin=margin)
        theirs = ref.find_continuous_high_activation_crop(
            act, (y0, y1, x0, x1), threshold=0.5, add_margin=margin)
        assert ours == tuple(theirs), (ours, theirs, (y0, y1, x0, x1))


def test_list_of_distances():
    x = np.array([[0.0, 0.0], [1.0, 1.0]])
    np.testing.assert_allclose(list_of_distances(x, x),
                               [[0, 2], [2, 0]])
