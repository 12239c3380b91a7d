"""Serving: AOT export round-trips + the pipelined streaming engine.

The exported StableHLO module must reproduce the jitted forward exactly
(same program, one lowering), survive serialize -> deserialize -> run,
and serve any batch size when exported with a symbolic batch dim.  The
engine must preserve input order, trim tail padding, and agree with
per-item direct calls.  Reference counterpart surface: the eval forward
of `segmentation/eval_valid_multiscale.py:118-131`; the reference has
no deployable-artifact path (SURVEY.md §5).
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scaleprotoseg_tpu.models.deeplab import DeepLabV2
from scaleprotoseg_tpu.models.ppnet import PPNet
from scaleprotoseg_tpu.serving import (ServingEngine, export_serving,
                                       load_artifact, make_mesh_predict,
                                       make_serving_fn, save_artifact)
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
    return model, spec, variables


def _images(n, rng_seed=0, h=33, w=33):
    rng = np.random.default_rng(rng_seed)
    return rng.standard_normal((n, h, w, 3)).astype(np.float32)


def test_export_fixed_batch_roundtrip(tiny, tmp_path):
    model, spec, variables = tiny
    x = _images(2)
    direct = jax.jit(make_serving_fn(model))(variables, x)
    assert direct.shape == (2, 33, 33)          # upsampled to input res
    assert direct.dtype == jnp.uint8   # labels ship 1 byte/pixel

    exported = export_serving(model, variables, height=33, width=33,
                              batch=2, input_dtype=jnp.float32)
    np.testing.assert_array_equal(exported.call(variables, x), direct)

    art = str(tmp_path / "artifact")
    save_artifact(art, exported, variables, spec=spec,
                  extra={"note": "test"})
    assert sorted(os.listdir(art)) == [
        "meta.json", "module.bin", "weights.ckpt", "weights.ckpt.json"]
    served = load_artifact(art)
    assert served.input_shape == (2, 33, 33, 3)
    assert served.spec == spec
    np.testing.assert_array_equal(np.asarray(served.predict(x)), direct)
    # shape guards
    with pytest.raises(ValueError, match="batch"):
        served.predict(_images(3))
    with pytest.raises(ValueError, match="exported"):
        served.predict(_images(2, h=17))


def test_export_symbolic_batch_serves_any_batch(tiny, tmp_path):
    model, spec, variables = tiny
    exported = export_serving(model, variables, height=33, width=33,
                              batch=None, input_dtype=jnp.float32)
    art = str(tmp_path / "artifact")
    save_artifact(art, exported, variables, spec=spec)
    served = load_artifact(art)
    assert served.input_shape[0] is None
    fn = jax.jit(make_serving_fn(model))
    for b in (1, 3):
        x = _images(b, rng_seed=b)
        np.testing.assert_array_equal(np.asarray(served.predict(x)),
                                      fn(variables, x))


def test_logits_output_mode(tiny):
    model, spec, variables = tiny
    x = _images(2)
    logits = jax.jit(make_serving_fn(model, output="logits",
                                     upsample=False))(variables, x)
    assert logits.ndim == 4 and logits.shape[-1] == spec.num_classes
    assert logits.dtype == jnp.float32
    # labels mode == argmax of upsampled logits mode
    up = jax.jit(make_serving_fn(model, output="logits"))(variables, x)
    labels = jax.jit(make_serving_fn(model))(variables, x)
    np.testing.assert_array_equal(labels, jnp.argmax(up, axis=-1))


def test_device_normalize_bit_parity(tiny):
    """On-device normalization of raw uint8 (`make_serving_fn
    normalize_to=`) is bit-identical to the host pipeline
    (`serve._make_preprocess`): same fp32 ops, same constants."""
    from scaleprotoseg_tpu.constants import IMAGENET_MEAN, IMAGENET_STD

    model, _, variables = tiny
    rng = np.random.default_rng(21)
    raw = rng.integers(0, 256, size=(2, 33, 33, 3)).astype(np.uint8)
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    host_x = (raw.astype(np.float32) / 255.0 - mean) / std

    host = jax.jit(make_serving_fn(model))(variables, host_x)
    dev = jax.jit(make_serving_fn(model, normalize_to=jnp.float32))(
        variables, raw)
    np.testing.assert_array_equal(np.asarray(dev), np.asarray(host))
    # mesh form composes with normalize_to
    from scaleprotoseg_tpu.parallel.mesh import create_mesh
    mesh = create_mesh(n_devices=2)
    mp = make_mesh_predict(model, variables, mesh,
                           normalize_to=jnp.float32)
    np.testing.assert_array_equal(np.asarray(mp(raw)), np.asarray(host))


def test_device_preprocess_export_roundtrip(tiny, tmp_path):
    """export_serving(device_preprocess=True) bakes normalization into
    the module: the artifact's wire dtype is uint8, meta records it,
    and the deserialized module reproduces the host-normalized jit."""
    model, spec, variables = tiny
    rng = np.random.default_rng(22)
    raw = rng.integers(0, 256, size=(2, 33, 33, 3)).astype(np.uint8)

    exported = export_serving(model, variables, height=33, width=33,
                              batch=2, input_dtype=jnp.float32,
                              device_preprocess=True)
    art = str(tmp_path / "artifact_u8")
    save_artifact(art, exported, variables, spec=spec)
    served = load_artifact(art)
    assert served.input_dtype == jnp.dtype(jnp.uint8)
    assert served.meta["input"]["device_normalize"] is True

    want = jax.jit(make_serving_fn(model, normalize_to=jnp.float32))(
        variables, raw)
    np.testing.assert_array_equal(np.asarray(served.predict(raw)),
                                  np.asarray(want))


def test_serve_cli_device_preprocess_default(tiny, tmp_path):
    """The CLI defaults to device-side normalization for uint8 sources
    and produces the same PNGs as --host-preprocess (bit-identical
    math); --canvas and float sources fall back to the host path."""
    import scaleprotoseg_tpu.serving.serve as serve_mod
    import scaleprotoseg_tpu.model_loading as ml

    model, spec, variables = tiny
    in_dir = tmp_path / "images"
    in_dir.mkdir()
    rng = np.random.default_rng(23)
    for i in range(3):
        np.save(in_dir / f"f{i}.npy",
                rng.integers(0, 256, size=(33, 33, 3)).astype(np.uint8))

    orig_load, orig_resolve = ml.load_model, ml.resolve_checkpoint
    ml.load_model = lambda *a, **k: (model, spec, variables)
    ml.resolve_checkpoint = lambda *a: "ckpt"
    try:
        rec_dev = serve_mod.main(
            ["run", "final", "--input", str(in_dir),
             "--output", str(tmp_path / "p_dev"), "--batch", "2",
             "--results-root", str(tmp_path)])
        assert rec_dev["preprocess"] == "device"
        rec_host = serve_mod.main(
            ["run", "final", "--input", str(in_dir),
             "--output", str(tmp_path / "p_host"), "--batch", "2",
             "--host-preprocess", "--results-root", str(tmp_path)])
        assert rec_host["preprocess"] == "host"
        from PIL import Image
        for i in range(3):
            a = np.asarray(Image.open(tmp_path / "p_dev" / f"f{i}.png"))
            b = np.asarray(Image.open(tmp_path / "p_host" / f"f{i}.png"))
            np.testing.assert_array_equal(a, b)

        # float sources imply the host path
        np.save(in_dir / "a_float.npy",
                rng.random((33, 33, 3)).astype(np.float32) * 255)
        rec_f = serve_mod.main(
            ["run", "final", "--input", str(in_dir),
             "--output", str(tmp_path / "p_f"), "--batch", "2",
             "--results-root", str(tmp_path)])
        assert rec_f["preprocess"] == "host"

        # a device-normalizing artifact refuses host-side flags
        art = str(tmp_path / "artifact")
        os.remove(in_dir / "a_float.npy")
        serve_mod.main(["run", "final", "--input", str(in_dir),
                        "--batch", "2", "--export", art,
                        "--results-root", str(tmp_path)])
        assert load_artifact(art).input_dtype == jnp.dtype(jnp.uint8)
        out = serve_mod.main(["--artifact", art, "--input", str(in_dir),
                              "--output", str(tmp_path / "p_art")])
        assert out["preprocess"] == "device"
        from PIL import Image
        for i in range(3):
            a = np.asarray(Image.open(tmp_path / "p_art" / f"f{i}.png"))
            b = np.asarray(Image.open(tmp_path / "p_dev" / f"f{i}.png"))
            np.testing.assert_array_equal(a, b)
        with pytest.raises(SystemExit):
            serve_mod.main(["--artifact", art, "--input", str(in_dir),
                            "--host-preprocess"])
    finally:
        ml.load_model, ml.resolve_checkpoint = orig_load, orig_resolve


def test_fast_requires_fixed_batch(tiny):
    model, _, variables = tiny
    with pytest.raises(ValueError, match="fixed batch"):
        export_serving(model, variables, height=33, width=33,
                       batch=None, fast=True)


def test_export_symbolic_batch_drops_model_fast_aspp(tiny, monkeypatch):
    """A model built fast (backbone.fast_aspp=True, e.g. by
    load_model(fast=True)) must still export with a symbolic batch:
    the model-side Pallas ASPP branch needs static block shapes, so
    export_serving drops the flag under batch=None (r5 — previously a
    shape-polymorphism ValueError from inside the kernel)."""
    import dataclasses
    monkeypatch.setenv("SCALEPROTOSEG_FORCE_FAST_ASPP", "interpret")
    model, spec, variables = tiny
    fast_model = dataclasses.replace(
        model, dtype=jnp.bfloat16,
        backbone=dataclasses.replace(model.backbone, fast_aspp=True,
                                     dtype=jnp.bfloat16))
    exported = export_serving(fast_model, variables, height=33, width=33,
                              batch=None, input_dtype=jnp.float32)
    # parity against the same bf16 model without the fast branch — the
    # drop must be the ONLY difference
    plain = dataclasses.replace(
        fast_model, backbone=dataclasses.replace(fast_model.backbone,
                                                 fast_aspp=False))
    fn = jax.jit(make_serving_fn(plain))
    x = _images(2)
    np.testing.assert_array_equal(np.asarray(exported.call(variables, x)),
                                  np.asarray(fn(variables, x)))


def test_engine_order_tail_and_parity(tiny):
    model, _, variables = tiny
    fn = jax.jit(make_serving_fn(model))
    imgs = _images(5, rng_seed=7)
    preprocess_calls = []

    def preprocess(i):
        preprocess_calls.append(i)
        return imgs[i]

    engine = ServingEngine(lambda x: fn(variables, jnp.asarray(x)),
                           batch_size=2, preprocess=preprocess)
    out = list(engine.run((f"img{i}", i) for i in range(5)))
    assert [k for k, _ in out] == [f"img{i}" for i in range(5)]
    assert sorted(preprocess_calls) == list(range(5))
    # per-item parity incl. the padded tail item (batch 3 of 2+2+1)
    direct = np.asarray(fn(variables, jnp.asarray(imgs)))
    for (key, pred), want in zip(out, direct):
        np.testing.assert_array_equal(pred, want)


def test_engine_rejects_bad_batch():
    with pytest.raises(ValueError):
        ServingEngine(lambda x: x, batch_size=0)


def test_mesh_predict_matches_single_device(tiny):
    """DP serving over the 8-virtual-device mesh == the single-device
    jit, bit for bit (params replicate, batch shards, GSPMD inserts the
    rest — `serving/export.make_mesh_predict`, the serve CLI's --mesh)."""
    from scaleprotoseg_tpu.parallel.mesh import create_mesh

    model, _, variables = tiny
    mesh = create_mesh()
    n = mesh.devices.size
    assert n == 8  # conftest pins the virtual device count
    x = _images(n, rng_seed=11)
    single = np.asarray(jax.jit(make_serving_fn(model))(variables, x))
    predict = make_mesh_predict(model, variables, mesh)
    out = predict(x)
    assert len(out.sharding.device_set) == n
    np.testing.assert_array_equal(np.asarray(out), single)
    with pytest.raises(ValueError, match="does not divide"):
        predict(_images(n - 1))
    # drives the engine unchanged (batch = mesh size, 2n items)
    engine = ServingEngine(predict, batch_size=n,
                           preprocess=lambda i: _images(
                               2 * n, rng_seed=11)[i])
    out = list(engine.run((f"i{j}", j) for j in range(2 * n)))
    assert [k for k, _ in out] == [f"i{j}" for j in range(2 * n)]
    for (_, pred), want in zip(out[:n], single):
        np.testing.assert_array_equal(pred, want)


def test_serve_cli_mesh_flag(tiny, tmp_path):
    """--mesh N end-to-end through the CLI (run-dir form), incl. the
    guard rails (--artifact conflict, batch divisibility)."""
    import scaleprotoseg_tpu.serving.serve as serve_mod

    model, spec, variables = tiny
    in_dir = tmp_path / "images"
    in_dir.mkdir()
    rng = np.random.default_rng(5)
    for i in range(4):
        np.save(in_dir / f"f{i}.npy",
                rng.integers(0, 256, size=(33, 33, 3)).astype(np.uint8))

    # run-dir loading is exercised by the existing CLI test; here patch
    # load_model to isolate the mesh plumbing
    import scaleprotoseg_tpu.model_loading as ml
    orig_load, orig_resolve = ml.load_model, ml.resolve_checkpoint
    ml.load_model = lambda *a, **k: (model, spec, variables)
    ml.resolve_checkpoint = lambda *a: "ckpt"
    try:
        record = serve_mod.main(
            ["run", "final", "--input", str(in_dir),
             "--output", str(tmp_path / "preds"), "--batch", "4",
             "--mesh", "2", "--results-root", str(tmp_path)])
        assert record["images"] == 4
        with pytest.raises(SystemExit):
            serve_mod.main(["run", "final", "--input", str(in_dir),
                            "--batch", "3", "--mesh", "2",
                            "--results-root", str(tmp_path)])
        with pytest.raises(SystemExit):
            serve_mod.main(["--artifact", "x", "--input", str(in_dir),
                            "--mesh", "2"])
    finally:
        ml.load_model, ml.resolve_checkpoint = orig_load, orig_resolve


def test_serve_cli_canvas_mixed_sizes(tiny, tmp_path):
    """--canvas serves a mixed-size directory through one compiled
    program: each image bottom/right-pads to the canvas and its
    prediction crops back to the original size; the cropped region
    equals serving the same image alone at its own shape."""
    import scaleprotoseg_tpu.serving.serve as serve_mod
    import scaleprotoseg_tpu.model_loading as ml

    model, spec, variables = tiny
    in_dir = tmp_path / "images"
    in_dir.mkdir()
    rng = np.random.default_rng(9)
    shapes = {"a": (33, 33), "b": (17, 25), "c": (29, 13)}
    for name, (h, w) in shapes.items():
        np.save(in_dir / f"{name}.npy",
                rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8))

    orig_load, orig_resolve = ml.load_model, ml.resolve_checkpoint
    ml.load_model = lambda *a, **k: (model, spec, variables)
    ml.resolve_checkpoint = lambda *a: "ckpt"
    try:
        record = serve_mod.main(
            ["run", "final", "--input", str(in_dir),
             "--output", str(tmp_path / "preds"), "--batch", "2",
             "--canvas", "33", "33", "--results-root", str(tmp_path)])
        assert record["images"] == 3
        from PIL import Image
        fn = jax.jit(make_serving_fn(model))
        for name, (h, w) in shapes.items():
            got = np.asarray(Image.open(tmp_path / "preds" /
                                        f"{name}.png"))
            assert got.shape == (h, w)
        # parity on the padded canvas: prediction of the padded image,
        # cropped, equals the PNG (serving is deterministic)
        pre = serve_mod._make_preprocess(str(in_dir))
        img = pre("b.npy")
        padded = np.pad(img, ((0, 33 - 17), (0, 33 - 25), (0, 0)))
        want = np.asarray(fn(variables, padded[None]))[0, :17, :25]
        got = np.asarray(Image.open(tmp_path / "preds" / "b.png"))
        np.testing.assert_array_equal(got, want)
        # images larger than the canvas are refused
        np.save(in_dir / "d.npy",
                rng.integers(0, 256, size=(50, 20, 3)).astype(np.uint8))
        with pytest.raises(ValueError, match="larger than the"):
            serve_mod.main(
                ["run", "final", "--input", str(in_dir),
                 "--output", str(tmp_path / "p2"), "--batch", "2",
                 "--canvas", "33", "33",
                 "--results-root", str(tmp_path)])
    finally:
        ml.load_model, ml.resolve_checkpoint = orig_load, orig_resolve


def test_serve_cli_multiplatform_export(tiny, tmp_path):
    """--export --platforms cpu,tpu: build-host artifact with platform-
    branched lowering; loads and serves on the current (cpu) backend and
    records both platforms in meta.json."""
    import scaleprotoseg_tpu.serving.serve as serve_mod
    import scaleprotoseg_tpu.model_loading as ml

    model, spec, variables = tiny
    in_dir = tmp_path / "images"
    in_dir.mkdir()
    rng = np.random.default_rng(4)
    for i in range(2):
        np.save(in_dir / f"f{i}.npy",
                rng.integers(0, 256, size=(33, 33, 3)).astype(np.uint8))
    art = str(tmp_path / "artifact")

    orig_load, orig_resolve = ml.load_model, ml.resolve_checkpoint
    ml.load_model = lambda *a, **k: (model, spec, variables)
    ml.resolve_checkpoint = lambda *a: "ckpt"
    try:
        record = serve_mod.main(
            ["run", "final", "--input", str(in_dir), "--batch", "2",
             "--export", art, "--platforms", "cpu,tpu",
             "--results-root", str(tmp_path)])
        assert sorted(record["platforms"]) == ["cpu", "tpu"]
        served = load_artifact(art)
        assert sorted(served.meta["platforms"]) == ["cpu", "tpu"]
        out = serve_mod.main(
            ["--artifact", art, "--input", str(in_dir),
             "--output", str(tmp_path / "preds")])
        assert out["images"] == 2
    finally:
        ml.load_model, ml.resolve_checkpoint = orig_load, orig_resolve


def test_quant8_export_roundtrip(tiny, tmp_path):
    """--quant8 composes with --export: the dynamic-int8 conv graph
    lowers through jax.export, and the deserialized artifact reproduces
    the in-process quant8 jit forward exactly (same program)."""
    import dataclasses

    model, spec, variables = tiny
    q8 = dataclasses.replace(
        model, backbone=dataclasses.replace(model.backbone, quant8=True))
    x = jnp.asarray(_images(2, rng_seed=9))
    direct = np.asarray(jax.jit(make_serving_fn(q8))(variables, x))

    exported = export_serving(q8, variables, height=33, width=33,
                              batch=2, input_dtype=jnp.float32)
    art = str(tmp_path / "artifact_q8")
    save_artifact(art, exported, variables, spec=spec,
                  extra={"quant8": True})
    served = load_artifact(art)
    np.testing.assert_array_equal(np.asarray(served.predict(x)), direct)
    assert served.meta["extra"]["quant8"] is True


def test_serve_cli_export_only_flags(tiny, tmp_path):
    """--platforms / --dynamic-batch shape the exported artifact: given
    without --export they error instead of silently disabling the fast
    path; a --dynamic-batch export reports a null batch like meta.json."""
    import scaleprotoseg_tpu.serving.serve as serve_mod
    import scaleprotoseg_tpu.model_loading as ml

    model, spec, variables = tiny
    in_dir = tmp_path / "images"
    in_dir.mkdir()
    np.save(in_dir / "f0.npy", np.random.default_rng(5).integers(
        0, 256, size=(33, 33, 3)).astype(np.uint8))

    for flag in (["--platforms", "cpu"], ["--dynamic-batch"]):
        with pytest.raises(SystemExit):
            serve_mod.main(["run", "final", "--input", str(in_dir),
                            "--results-root", str(tmp_path)] + flag)

    orig_load, orig_resolve = ml.load_model, ml.resolve_checkpoint
    ml.load_model = lambda *a, **k: (model, spec, variables)
    ml.resolve_checkpoint = lambda *a: "ckpt"
    try:
        art = str(tmp_path / "artifact")
        record = serve_mod.main(
            ["run", "final", "--input", str(in_dir), "--batch", "2",
             "--export", art, "--dynamic-batch",
             "--results-root", str(tmp_path)])
        assert record["input"][0] is None
        served = load_artifact(art)
        assert served.input_shape[0] is None
    finally:
        ml.load_model, ml.resolve_checkpoint = orig_load, orig_resolve


def test_serve_cli_artifact_path(tiny, tmp_path, capsys):
    model, spec, variables = tiny
    exported = export_serving(model, variables, height=33, width=33,
                              batch=2, input_dtype=jnp.float32)
    art = str(tmp_path / "artifact")
    save_artifact(art, exported, variables, spec=spec)

    in_dir = tmp_path / "images"
    in_dir.mkdir()
    rng = np.random.default_rng(3)
    for i in range(3):
        np.save(in_dir / f"frame_{i}.npy",
                rng.integers(0, 256, size=(33, 33, 3)).astype(np.uint8))
    out_dir = str(tmp_path / "preds")

    from scaleprotoseg_tpu.serving.serve import main
    record = main(["--artifact", art, "--input", str(in_dir),
                   "--output", out_dir])
    assert record["images"] == 3
    assert sorted(os.listdir(out_dir)) == [
        "frame_0.png", "frame_1.png", "frame_2.png"]
    printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert printed["images"] == 3
    # PNG label maps round-trip as uint8 train ids
    from PIL import Image
    arr = np.asarray(Image.open(os.path.join(out_dir, "frame_0.png")))
    assert arr.shape == (33, 33) and arr.max() < spec.num_classes


def test_serve_cli_raw_output_and_writer_pool(tiny, tmp_path):
    """--raw-output writes .npy label arrays; the threaded writer pool
    (--writers) must preserve per-name content exactly vs the PNG path
    (writes are independent per item, so pooling cannot reorder data —
    only the filesystem timing)."""
    import scaleprotoseg_tpu.model_loading as ml
    import scaleprotoseg_tpu.serving.serve as serve_mod
    from PIL import Image

    model, spec, variables = tiny
    in_dir = tmp_path / "images"
    in_dir.mkdir()
    rng = np.random.default_rng(7)
    for i in range(5):
        np.save(in_dir / f"f{i}.npy",
                rng.integers(0, 256, size=(33, 33, 3)).astype(np.uint8))

    orig_load, orig_resolve = ml.load_model, ml.resolve_checkpoint
    ml.load_model = lambda *a, **k: (model, spec, variables)
    ml.resolve_checkpoint = lambda *a: "ckpt"
    try:
        rec_png = serve_mod.main(
            ["run", "final", "--input", str(in_dir),
             "--output", str(tmp_path / "p_png"), "--batch", "2",
             "--writers", "3", "--results-root", str(tmp_path)])
        rec_raw = serve_mod.main(
            ["run", "final", "--input", str(in_dir),
             "--output", str(tmp_path / "p_raw"), "--batch", "2",
             "--raw-output", "--results-root", str(tmp_path)])
        assert rec_png["images"] == rec_raw["images"] == 5
        for i in range(5):
            png = np.asarray(Image.open(tmp_path / "p_png" / f"f{i}.png"))
            raw = np.load(tmp_path / "p_raw" / f"f{i}.npy")
            np.testing.assert_array_equal(png, raw)
    finally:
        ml.load_model, ml.resolve_checkpoint = orig_load, orig_resolve


def test_serve_cli_quant8_static(tiny, tmp_path):
    """--quant8-static: the CLI calibrates on the first --calib-images
    inputs, serves with static scales, and an --export artifact carries
    the calibrated scales."""
    import dataclasses

    import scaleprotoseg_tpu.model_loading as ml
    import scaleprotoseg_tpu.serving.serve as serve_mod

    model, spec, variables = tiny
    in_dir = tmp_path / "images"
    in_dir.mkdir()
    rng = np.random.default_rng(5)
    for i in range(4):
        np.save(in_dir / f"f{i}.npy",
                rng.integers(0, 256, size=(33, 33, 3)).astype(np.uint8))

    def fake_load(*a, **k):
        q8 = k.get("quant8", False)
        m = model
        if q8:
            m = dataclasses.replace(
                m, backbone=dataclasses.replace(m.backbone, quant8=q8))
        return m, spec, variables

    orig_load, orig_resolve = ml.load_model, ml.resolve_checkpoint
    ml.load_model = fake_load
    ml.resolve_checkpoint = lambda *a: "ckpt"
    try:
        rec = serve_mod.main(
            ["run", "final", "--input", str(in_dir),
             "--output", str(tmp_path / "p_st"), "--batch", "2",
             "--quant8-static", "--calib-images", "2",
             "--results-root", str(tmp_path)])
        assert rec["images"] == 4
        assert len(os.listdir(tmp_path / "p_st")) == 4

        rec_x = serve_mod.main(
            ["run", "final", "--input", str(in_dir),
             "--export", str(tmp_path / "art_st"), "--batch", "2",
             "--quant8-static", "--calib-images", "2",
             "--results-root", str(tmp_path)])
        assert rec_x["exported"]
        from scaleprotoseg_tpu.serving.export import load_artifact
        served = load_artifact(str(tmp_path / "art_st"))
        assert "quant_scales" in served.variables
        assert served.meta["extra"]["quant8"] == "static"
    finally:
        ml.load_model, ml.resolve_checkpoint = orig_load, orig_resolve


def test_mesh_predict_quant8_static_matches_single_device(tiny):
    """Static-int8 serving composes with the DP mesh: calibrated
    quant_scales replicate like params, the int8 convs partition on
    batch like any XLA op, and the 8-device prediction is bit-equal to
    the single-device jit (what `serve --mesh N --quant8-static` runs)."""
    import dataclasses

    from scaleprotoseg_tpu.model_loading import calibrate_quant_scales
    from scaleprotoseg_tpu.parallel.mesh import create_mesh

    model, _, variables = tiny
    model_q8 = dataclasses.replace(
        model, backbone=dataclasses.replace(model.backbone,
                                            quant8="static"))
    mesh = create_mesh()
    n = mesh.devices.size
    x = _images(n, rng_seed=13)
    variables_q8 = calibrate_quant_scales(model_q8, variables, [x[:2]])
    single = np.asarray(
        jax.jit(make_serving_fn(model_q8))(variables_q8, x))
    out = make_mesh_predict(model_q8, variables_q8, mesh)(x)
    assert len(out.sharding.device_set) == n
    np.testing.assert_array_equal(np.asarray(out), single)
