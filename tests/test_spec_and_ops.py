"""Golden tests for ProtoSpec bookkeeping and core prototype/simplex/resize
ops against closed-form numpy references (SURVEY.md §4 test strategy #1-2)."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from scaleprotoseg_tpu.ops.prototype import (
    distance_to_similarity, pairwise_l2, scale_l2_distances)
from scaleprotoseg_tpu.ops.resize import (
    resize_bilinear, resize_label_nearest, resize_label_nearest_np)
from scaleprotoseg_tpu.ops.simplex import (
    projection_simplex_sort, projection_simplex_sort_masked)
from scaleprotoseg_tpu.spec import ProtoSpec


# ---------------------------------------------------------------------------
# ProtoSpec
# ---------------------------------------------------------------------------
def test_equal_allocation_matches_reference_block_layout():
    # Cityscapes multiscale config: (228, 64, 1, 1), 19 classes, 4 scales
    # (ref model_multiscale.py:131-149 block structure).
    spec = ProtoSpec.equal_allocation(228, 64, num_classes=19, num_scales=4)
    assert spec.num_prototypes == 228
    per_scale = 228 // 4
    per_cs = 228 // 19 // 4
    identity = spec.class_identity
    for s in range(4):
        assert spec.scale_bounds[s] == (s * per_scale, (s + 1) * per_scale)
        for c in range(19):
            lo = s * per_scale + c * per_cs
            block = identity[lo:lo + per_cs]
            assert (block[:, c] == 1).all()
            assert block.sum() == per_cs
    assert spec.is_regular
    # Every prototype assigned exactly once.
    assert (identity.sum(axis=1) == 1).all()
    assert (spec.class_counts == 12).all()
    assert (spec.class_scale_counts == 3).all()


def test_equal_allocation_leftover_prototypes_unassigned():
    # 10 prototypes, 3 classes, 1 scale: 10//3 = 3 per class, 1 leftover
    # with an all-zero identity row (reference floor-division semantics).
    spec = ProtoSpec.equal_allocation(10, 8, num_classes=3, num_scales=1)
    assert spec.class_identity.sum() == 9
    assert spec.class_ids[9] == -1


def test_prune_repacks_scale_bounds():
    spec = ProtoSpec.equal_allocation(24, 16, num_classes=2, num_scales=4,
                                      num_groups=3)
    pruned = spec.prune([0, 7, 13])  # one from scale 0, one s1, one s2
    assert pruned.num_prototypes == 21
    # ref model_multiscale.py:400-432: contiguous re-packed ranges.
    assert pruned.scale_bounds == ((0, 5), (5, 10), (10, 15), (15, 21))
    keep = spec.keep_indices([0, 7, 13])
    np.testing.assert_array_equal(
        pruned.class_identity, spec.class_identity[keep])


# ---------------------------------------------------------------------------
# L2 distances
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("irregular", [False, True])
def test_scale_l2_distances_matches_naive(rng, irregular):
    S, D, P = 4, 8, 16
    feats = rng.standard_normal((2, 5, 6, S * D)).astype(np.float32)
    protos = rng.random((P, D)).astype(np.float32)
    if irregular:
        bounds = ((0, 3), (3, 9), (9, 12), (12, 16))
    else:
        bounds = tuple((s * 4, (s + 1) * 4) for s in range(S))
    d = np.array(scale_l2_distances(jnp.asarray(feats), jnp.asarray(protos),
                                    bounds))
    # naive: for each scale block, squared L2 between pixel vec and proto.
    expected = np.zeros_like(d)
    for s, (lo, hi) in enumerate(bounds):
        xs = feats[..., s * D:(s + 1) * D]
        for p in range(lo, hi):
            diff = xs - protos[p]
            expected[..., p] = np.maximum((diff ** 2).sum(-1), 0.0)
    np.testing.assert_allclose(d, expected, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("bounds", [
    ((0, 4), (4, 8), (8, 12), (12, 16)),        # uniform
    ((0, 3), (3, 9), (9, 12), (12, 14)),        # irregular (post-prune)
    ((0, 14),),                                  # single-scale (coco)
], ids=["uniform", "irregular", "single"])
def test_scale_l2_distances_bf16_blockdiag(rng, bounds):
    """bf16 features route through the block-diagonal matmul form
    (custom VJP, ops/prototype.py r5): values match the fp32 reference
    path within bf16 rounding, gradients match fp32 AD through the
    custom VJP, and dangling bank rows past the last bound get exactly
    zero prototype gradient."""
    S = len(bounds)
    D, P = 8, 16  # P > bounds[-1][1]: rows 14/15 dangle (coco-style)
    feats = rng.random((2, 5, 6, S * D)).astype(np.float32)
    # prototypes offset from the feature range: distances stay bounded
    # away from the ReLU clamp, where a single bf16 rounding can flip
    # the mask and make the (legitimate) subgradient comparison moot
    protos = (2.0 + rng.random((P, D))).astype(np.float32)
    x32, p32 = jnp.asarray(feats), jnp.asarray(protos)

    ref = np.array(scale_l2_distances(x32, p32, bounds))
    got = np.array(scale_l2_distances(x32.astype(jnp.bfloat16), p32,
                                      bounds), np.float32)
    assert got.dtype == np.float32
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=0.02 * scale)

    def loss32(x, p):
        return jnp.sum(jnp.sin(scale_l2_distances(x, p, bounds)))

    def loss16(x, p):
        return jnp.sum(jnp.sin(scale_l2_distances(
            x.astype(jnp.bfloat16), p, bounds)))

    gx32, gp32 = jax.grad(loss32, (0, 1))(x32, p32)
    gx16, gp16 = jax.grad(loss16, (0, 1))(x32, p32)
    for a, b in ((gx32, gx16), (gp32, gp16)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        np.testing.assert_allclose(b, a, atol=0.03 * np.abs(a).max())
    assert np.asarray(gp16).dtype == np.float32
    active = bounds[-1][1]
    assert np.all(np.asarray(gp16)[active:] == 0.0)


def test_distance_to_similarity_log():
    d = jnp.asarray([0.0, 1.0, 100.0])
    sim = np.array(distance_to_similarity(d))
    expected = np.log((np.array([0.0, 1.0, 100.0]) + 1) /
                      (np.array([0.0, 1.0, 100.0]) + 1e-4))
    np.testing.assert_allclose(sim, expected, rtol=1e-5)
    np.testing.assert_allclose(
        np.array(distance_to_similarity(d, "linear")), [0.0, -1.0, -100.0])


def test_pairwise_l2(rng):
    a = rng.standard_normal((5, 7)).astype(np.float32)
    b = rng.standard_normal((3, 7)).astype(np.float32)
    got = np.array(pairwise_l2(jnp.asarray(a), jnp.asarray(b)))
    exp = ((a[:, None] - b[None]) ** 2).sum(-1)
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Simplex projection (ref utils.py:113-124)
# ---------------------------------------------------------------------------
def _np_projection_simplex_sort(v, z=1.0):
    """Loop-free numpy restatement of the reference algorithm."""
    u = np.sort(v, axis=1)[:, ::-1]
    cssv = np.cumsum(u, axis=1) - z
    ind = np.arange(1, v.shape[1] + 1)
    cond = u - cssv / ind > 0
    rho = (ind * cond).max(axis=1)
    ind_rho = (ind * cond).argmax(axis=1)
    theta = cssv[np.arange(len(v)), ind_rho] / rho
    return np.maximum(v - theta[:, None], 0.0)


def test_projection_simplex_sort_properties(rng):
    v = rng.standard_normal((20, 12)).astype(np.float32) * 3
    w = np.array(projection_simplex_sort(jnp.asarray(v)))
    np.testing.assert_allclose(w, _np_projection_simplex_sort(v),
                               rtol=1e-5, atol=1e-6)
    assert (w >= 0).all()
    np.testing.assert_allclose(w.sum(axis=1), 1.0, rtol=1e-5)
    # Idempotent.
    w2 = np.array(projection_simplex_sort(jnp.asarray(w)))
    np.testing.assert_allclose(w2, w, rtol=1e-5, atol=1e-6)


def test_projection_simplex_sort_masked(rng):
    v = rng.standard_normal((6, 10)).astype(np.float32)
    mask = np.zeros((6, 10), np.float32)
    mask[:, :7] = 1.0
    w = np.array(projection_simplex_sort_masked(jnp.asarray(v),
                                                jnp.asarray(mask)))
    expected = np.zeros_like(v)
    expected[:, :7] = _np_projection_simplex_sort(v[:, :7])
    np.testing.assert_allclose(w, expected, rtol=1e-5, atol=1e-6)
    assert (w[:, 7:] == 0).all()


# ---------------------------------------------------------------------------
# Resize parity with PIL (ref dataset.py:22-30)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("out_size", [(13, 17), (65, 65), (7, 5)])
def test_resize_label_nearest_matches_pil(rng, out_size):
    label = rng.integers(0, 20, size=(33, 47)).astype(np.uint8)
    w, h = out_size
    pil = np.asarray(
        Image.fromarray(label.astype(float)).resize((w, h), Image.NEAREST)
    ).astype(np.int64)
    np.testing.assert_array_equal(
        resize_label_nearest_np(label, (w, h)), pil)
    np.testing.assert_array_equal(
        np.array(resize_label_nearest(jnp.asarray(label), h, w)), pil)


def test_resize_bilinear_halfpixel_convention(rng):
    # torch F.interpolate(align_corners=False) on a 2x upscale of a ramp:
    # verify against the analytically known half-pixel result via torch.
    torch = pytest.importorskip("torch")
    x = rng.standard_normal((1, 6, 8, 3)).astype(np.float32)
    got = np.array(resize_bilinear(jnp.asarray(x), 12, 16))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    exp = torch.nn.functional.interpolate(
        xt, size=(12, 16), mode="bilinear", align_corners=False)
    exp = exp.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_resize_bilinear_downscale_no_antialias(rng):
    # torch interpolate never antialiases; jax.image.resize does by
    # default when shrinking — parity requires antialias=False (MSC
    # pyramid path, ref utils.py:96-101).
    torch = pytest.importorskip("torch")
    x = rng.standard_normal((1, 20, 28, 3)).astype(np.float32)
    got = np.array(resize_bilinear(jnp.asarray(x), 10, 14))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    exp = torch.nn.functional.interpolate(
        xt, size=(10, 14), mode="bilinear", align_corners=False)
    np.testing.assert_allclose(got, exp.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((6, 8), (12, 16)),       # clean 2x up
    ((129, 257), (1024, 2048)),  # serving's logit upsample shape ratio
    ((20, 28), (10, 14)),     # downscale (2-tap, antialias-free)
    ((17, 13), (33, 29)),     # odd/odd
])
def test_resize_bilinear_matrix_matches_torch(rng, in_hw, out_hw):
    # the MXU einsum form (serving upsample) uses the same
    # align_corners=False grid as resize_bilinear/torch; summation
    # order differs, so parity is fp32-roundoff, not bit
    from scaleprotoseg_tpu.ops.resize import resize_bilinear_matrix
    torch = pytest.importorskip("torch")
    x = rng.standard_normal((2, *in_hw, 3)).astype(np.float32)
    got = np.array(resize_bilinear_matrix(jnp.asarray(x), *out_hw))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    exp = torch.nn.functional.interpolate(
        xt, size=out_hw, mode="bilinear", align_corners=False)
    np.testing.assert_allclose(got, exp.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        got, np.array(resize_bilinear(jnp.asarray(x), *out_hw)),
        rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("size,factor", [(65, 0.5), (65, 0.75), (32, 0.5)])
def test_resize_bilinear_factor_matches_torch(rng, size, factor):
    # scale_factor semantics: torch maps output pixel o to input coord
    # (o+0.5)/p - 0.5 using exactly 1/p — differs from size-based resize
    # on odd sizes (ref utils.py:101 F.interpolate(x, scale_factor=p)).
    from scaleprotoseg_tpu.ops.resize import resize_bilinear_factor
    torch = pytest.importorskip("torch")
    x = rng.standard_normal((2, size, size, 3)).astype(np.float32)
    got = np.array(resize_bilinear_factor(jnp.asarray(x), factor))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    exp = torch.nn.functional.interpolate(
        xt, scale_factor=factor, mode="bilinear", align_corners=False)
    np.testing.assert_allclose(got, exp.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Multi-device sanity (virtual mesh active)
# ---------------------------------------------------------------------------
def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8
