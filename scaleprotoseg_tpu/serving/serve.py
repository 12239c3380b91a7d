"""Serving CLI: stream a directory of images through the model at
sustained device throughput and write PNG label maps.

Two model sources:

  python -m scaleprotoseg_tpu.serving.serve --artifact DIR ...
      load a `jax.export` artifact (no model code / config needed);

  python -m scaleprotoseg_tpu.serving.serve MODEL_NAME PHASE ...
      rebuild from a run directory like the eval CLIs
      (`eval_test.py`), jit on the fly (fused fast path on TPU).

Add ``--export DIR`` to the second form to write the AOT artifact
instead of serving (the deploy step).

Input: a directory of ``.npy`` uint8 images (the repo's preprocessed
format, ref `img_with_margin_0/test`) or ``.png``; serving runs ONE
compiled program, so images must share one shape — or pass
``--canvas H W`` to bottom/right-pad a mixed-size directory to a
common canvas and crop each prediction back.  Output: one grayscale
PNG of train-id labels per image + a JSON throughput line.

Normalization runs ON DEVICE by default: raw uint8 ships over the
wire (4x less transfer than fp32, no per-image host float pass — the
streaming bottleneck on thin hosts) and the served graph computes the
same fp32 ``(x/255 - mean)/std`` bit-identically.  ``--host-preprocess``
restores the host path; ``--canvas`` and float sources imply it.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import List, Optional

import numpy as np

from scaleprotoseg_tpu import settings
from scaleprotoseg_tpu.constants import IMAGENET_MEAN, IMAGENET_STD


def _list_images(input_dir: str, limit: Optional[int]) -> List[str]:
    names = sorted(p for p in os.listdir(input_dir)
                   if p.endswith((".npy", ".png", ".jpg")))
    if not names:
        raise FileNotFoundError(f"no .npy/.png/.jpg images in {input_dir}")
    return names[:limit] if limit else names


def _make_preprocess(input_dir: str, margin: int = 0,
                     canvas=None, sizes=None, normalize: bool = True):
    """Decode + normalize; with ``canvas=(H, W)`` bottom/right-pad every
    image to one fixed shape (zeros after normalization = the dataset
    mean) so a single compiled program serves a mixed-size directory.
    ``sizes`` (a dict) records each name's pre-pad (h, w) for cropping
    the prediction back — filled from the engine's preprocess threads,
    always before that item's batch is dispatched.

    ``normalize=False`` is the device-preprocess mode (the default
    serving path): the host only decodes, and raw uint8 ships to the
    device, where the served graph normalizes
    (`export.make_serving_fn(normalize_to=...)`) — 4x less transfer
    and no per-image host float pass.  Requires uint8 sources."""
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)

    def preprocess(name: str) -> np.ndarray:
        path = os.path.join(input_dir, name)
        if name.endswith(".npy"):
            img = np.load(path)
        else:
            from PIL import Image
            img = np.asarray(Image.open(path).convert("RGB"))
        if margin:
            img = img[margin:-margin, margin:-margin]
        if canvas is not None and not normalize:
            # canvas padding must be EXACTLY the dataset mean (zero in
            # normalized space) for the pad-crop parity contract; uint8
            # can only approximate it, so main() forces host preprocess
            raise AssertionError("--canvas requires host preprocessing")
        if normalize:
            out = (img.astype(np.float32) / 255.0 - mean) / std
        elif img.dtype != np.uint8:
            raise ValueError(
                f"{name} is {img.dtype}, not uint8 — device-side "
                "normalization ingests raw uint8; rerun with "
                "--host-preprocess for float sources")
        else:
            out = img
        if canvas is not None:
            h, w = out.shape[:2]
            ch, cw = canvas
            if h > ch or w > cw:
                raise ValueError(f"{name} is {h}x{w}, larger than the "
                                 f"--canvas {ch}x{cw}")
            if sizes is not None:
                sizes[name] = (h, w)
            out = np.pad(out, ((0, ch - h), (0, cw - w), (0, 0)))
        return out

    return preprocess


def run_serving(predict, names, preprocess, out_dir: str,
                batch_size: int, workers: int = 2, sizes=None,
                writers: int = 2, raw_output: bool = False) -> dict:
    """Stream ``names`` through ``predict``; save predictions; stats.

    Timing starts after a one-batch warmup (compile/cache-load excluded
    — serving steady-state is the metric) and covers the full pipeline
    including host decode and prediction writes.

    Writes run in their own thread pool (``writers``): the engine's
    consumer loop must never stall the generator, or the decode/compute
    pipeline behind it drains — PNG encode of a 1024x2048 label is
    ~21 ms/img (benchmarks/bench_input.py), ~70% of the device step.
    ``raw_output`` saves ``.npy`` label arrays instead of PNGs (a plain
    memcpy to disk, ~20x cheaper — for pipelines that consume arrays).
    """
    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    from scaleprotoseg_tpu.serving.engine import ServingEngine

    os.makedirs(out_dir, exist_ok=True)
    engine = ServingEngine(predict, batch_size, preprocess=preprocess,
                           workers=workers)

    def write_one(name, pred):
        stem = os.path.splitext(name)[0]
        if sizes is not None and name in sizes:
            h, w = sizes[name]
            pred = pred[:h, :w]
        if raw_output:
            np.save(os.path.join(out_dir, f"{stem}.npy"),
                    pred.astype(np.uint8))
        else:
            Image.fromarray(pred.astype(np.uint8)).convert("L").save(
                os.path.join(out_dir, f"{stem}.png"))

    # warmup: compile + one full pipeline pass on the first batch
    for _ in engine.run((n, n) for n in names[:batch_size]):
        pass
    t0 = time.perf_counter()
    count = 0
    with ThreadPoolExecutor(max(1, writers)) as pool:
        pending = []
        for name, pred in engine.run((n, n) for n in names):
            pending.append(pool.submit(write_one, name, pred))
            count += 1
            if len(pending) > 2 * writers:   # bound memory; surface errors
                pending.pop(0).result()
        for fut in pending:
            fut.result()
    dt = time.perf_counter() - t0
    return {"images": count, "seconds": round(dt, 3),
            "img_per_s": round(count / dt, 3) if dt else None,
            "batch_size": batch_size, "output_dir": out_dir}


def main(argv: Optional[List[str]] = None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model_name", nargs="?")
    p.add_argument("training_phase", nargs="?")
    p.add_argument("--artifact", help="serving artifact dir "
                   "(alternative to MODEL_NAME PHASE)")
    p.add_argument("--export", help="write an AOT artifact here and exit")
    p.add_argument("--input", required=True, help="image directory")
    p.add_argument("--output", help="prediction directory "
                   "(default <input>/predictions)")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--limit", type=int)
    p.add_argument("--margin", type=int, default=0)
    p.add_argument("--canvas", type=int, nargs=2, metavar=("H", "W"),
                   help="serve mixed-size images: pad each to HxW (one "
                   "compiled program), crop predictions back per image")
    p.add_argument("--workers", type=int, default=2,
                   help="decode/preprocess threads")
    p.add_argument("--writers", type=int, default=2,
                   help="prediction-write threads (PNG encode is "
                   "~21 ms/img at 1024x2048 — serial writes would "
                   "stall the pipeline)")
    p.add_argument("--raw-output", action="store_true",
                   help="write .npy label arrays instead of PNGs "
                   "(~20x cheaper on the host)")
    p.add_argument("--results-root", help="override settings results dir")
    p.add_argument("--host-preprocess", action="store_true",
                   help="normalize on the host (fp32) instead of the "
                   "default on-device normalization of raw uint8 "
                   "(bit-identical math; the device path ships 4x "
                   "less data and frees the host decode threads). "
                   "Implied by --canvas and by float image sources")
    p.add_argument("--no-fast", action="store_true",
                   help="disable the fused Pallas fast path")
    p.add_argument("--quant8", action="store_true",
                   help="dynamic w8a8 int8 layer4/5 convs (~0.5%% "
                   "logit perturbation; memory knob — the per-conv "
                   "dynamic quantize makes it SLOWER than bf16 on "
                   "v5e, and it forces the fully-XLA path: see "
                   "ops/quant.py)")
    p.add_argument("--quant8-static", action="store_true",
                   help="static-scale w8a8 int8 layer4/5 convs: "
                   "calibrates activation scales on the first "
                   "--calib-images inputs, then serves with the "
                   "quantize fused into conv epilogues.  Composes "
                   "with the Pallas fast path (unlike --quant8) — "
                   "the fastest measured serving config on v5e "
                   "(40.5 vs 38.0 img/s bf16; ops/quant.py)")
    p.add_argument("--calib-images", type=int, default=8,
                   help="calibration inputs for --quant8-static")
    p.add_argument("--dynamic-batch", action="store_true",
                   help="export with a symbolic batch dim (XLA path)")
    p.add_argument("--platforms",
                   help="comma-separated export platforms, e.g. "
                   "'cpu,tpu': build the artifact on one host type, "
                   "serve it on another (XLA path — the Pallas fast "
                   "path lowers for TPU only)")
    p.add_argument("--mesh", type=int, default=1,
                   help="data-parallel serving over the first N devices "
                   "(run-dir form only; batch must be a multiple of N)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    names = _list_images(args.input, args.limit)
    canvas = tuple(args.canvas) if args.canvas else None
    sizes = {} if canvas else None

    # shape probe + preprocess-mode choice: device-side normalization
    # (uint8 on the wire) is the default; --canvas needs an exact
    # dataset-mean pad and float sources can't ship as uint8, so both
    # imply the host path
    first = os.path.join(args.input, names[0])
    if names[0].endswith(".npy"):
        raw0 = np.load(first)
    else:
        from PIL import Image
        raw0 = np.asarray(Image.open(first).convert("RGB"))
    if args.margin:
        raw0 = raw0[args.margin:-args.margin, args.margin:-args.margin]
    h, w = canvas if canvas else raw0.shape[:2]
    device_pre = not (args.host_preprocess or canvas
                      or raw0.dtype != np.uint8)
    if args.platforms and not args.export:
        p.error("--platforms shapes the exported artifact; pass --export")
    if args.dynamic_batch and not args.export:
        p.error("--dynamic-batch shapes the exported artifact; "
                "pass --export")
    # --platforms / --dynamic-batch imply the portable XLA path: the
    # Pallas fast kernel lowers for the TPU backend only and its grids
    # need a static batch, and load_model(fast=True) bakes it into the
    # backbone itself — so the exclusion must happen here, at load time
    fast = ((not args.no_fast) and jax.default_backend() == "tpu"
            and not args.platforms and not args.dynamic_batch)

    if args.artifact:
        if args.mesh > 1:
            p.error("--mesh serves from a run directory (a jax.export "
                    "artifact is a single-device program); drop "
                    "--artifact to shard over devices")
        from scaleprotoseg_tpu.serving.export import load_artifact
        served = load_artifact(args.artifact)
        if (h, w) != tuple(served.input_shape[1:3]):
            raise ValueError(f"images are {h}x{w} but the artifact was "
                             f"exported for {served.input_shape[1:3]}")
        b = served.input_shape[0]
        batch = args.batch if b is None else b
        predict, in_dtype = served.predict, served.input_dtype
        # the artifact dictates the preprocess split: a uint8-input
        # module has normalization baked in (export --device-preprocess
        # default); float-input modules expect host-normalized data
        art_dev = bool(served.meta["input"].get(
            "device_normalize", in_dtype == jnp.dtype(jnp.uint8)))
        if art_dev and (args.host_preprocess or canvas):
            p.error("this artifact normalizes on device (uint8 input); "
                    "--host-preprocess/--canvas need a host-normalized "
                    "artifact — re-export with --host-preprocess")
        device_pre = art_dev
    else:
        if not (args.model_name and args.training_phase):
            p.error("need MODEL_NAME TRAINING_PHASE or --artifact")
        from scaleprotoseg_tpu.model_loading import (load_model,
                                                     resolve_checkpoint)
        model_path = os.path.join(
            args.results_root or settings.results_dir(), args.model_name)
        ckpt = resolve_checkpoint(model_path, args.training_phase)
        if args.quant8 and args.quant8_static:
            p.error("--quant8 and --quant8-static are exclusive")
        quant8 = "static" if args.quant8_static else args.quant8
        in_dtype = jnp.bfloat16 if fast else jnp.float32
        model, spec, variables = load_model(model_path, ckpt,
                                            dtype=in_dtype, fast=fast,
                                            quant8=quant8)
        if quant8 == "static":
            # PTQ calibration on the first inputs of the served
            # directory, host-normalized into the model's input space
            # (the device-preprocess wire format is irrelevant here:
            # calibration drives model.apply directly)
            from scaleprotoseg_tpu.model_loading import \
                calibrate_quant_scales
            calib_pre = _make_preprocess(args.input, args.margin,
                                         canvas=canvas, sizes={},
                                         normalize=True)
            batches = (np.asarray(calib_pre(n), in_dtype)[None]
                       for n in names[:max(args.calib_images, 1)])
            variables = calibrate_quant_scales(model, variables, batches,
                                               log=print)
        if args.export:
            from scaleprotoseg_tpu.serving.export import (export_serving,
                                                          save_artifact)
            platforms = args.platforms.split(",") if args.platforms \
                else None
            exported = export_serving(
                model, variables, height=h, width=w,
                batch=None if args.dynamic_batch else args.batch,
                input_dtype=in_dtype, fast=fast,
                platforms=platforms, device_preprocess=device_pre)
            save_artifact(args.export, exported, variables, spec=spec,
                          extra={"model_path": model_path,
                                 "checkpoint": ckpt, "fast": fast,
                                 "quant8": quant8})
            record = {"exported": args.export,
                      "input": [None if args.dynamic_batch else args.batch,
                                h, w, 3],
                      "platforms": list(exported.platforms)}
            print(json.dumps(record))
            return record
        if args.mesh > 1:
            from scaleprotoseg_tpu.parallel.mesh import create_mesh
            from scaleprotoseg_tpu.serving.export import make_mesh_predict
            if args.batch % args.mesh:
                p.error(f"--batch {args.batch} must be a multiple of "
                        f"--mesh {args.mesh}")
            predict = make_mesh_predict(
                model, variables, create_mesh(n_devices=args.mesh),
                fast=fast,
                normalize_to=in_dtype if device_pre else None)
        else:
            from scaleprotoseg_tpu.serving.export import make_serving_fn
            fn = jax.jit(make_serving_fn(
                model, fast=fast,
                normalize_to=in_dtype if device_pre else None))
            predict = lambda x: fn(variables, x)  # noqa: E731
        batch = args.batch

    out_dir = args.output or os.path.join(args.input, "predictions")
    wire_dtype = jnp.dtype(jnp.uint8) if device_pre else jnp.dtype(in_dtype)
    preprocess = _make_preprocess(args.input, args.margin, canvas=canvas,
                                  sizes=sizes, normalize=not device_pre)
    cast = lambda name: np.asarray(  # noqa: E731
        preprocess(name), wire_dtype)
    record = run_serving(predict, names, cast, out_dir, batch,
                         workers=args.workers, sizes=sizes,
                         writers=args.writers, raw_output=args.raw_output)
    record["preprocess"] = "device" if device_pre else "host"
    print(json.dumps(record))
    return record


if __name__ == "__main__":
    main()
