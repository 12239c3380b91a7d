"""Host-side input throughput: does the host keep the chip fed?

The reference tolerates slow input by throwing DataLoader worker
processes at it (`segmentation/data/data_module.py:17-80`, n_jobs); a
TPU framework cannot hand-wave this — the v5e joint train step is
42.9 ms at batch 2 (benchmarks/README.md), i.e. the host must sustain
~47 aug'd images/s PER CHIP or the MXU idles.  This measures, with NO
device in the loop:

  train arm    absolute img/s of the training augmentation pipeline at
               Cityscapes shapes (1024x2048 source -> scale in
               [0.5, 1.5] -> 513x513 crop), for the numpy/cv2 reference
               pipeline and the native C++ fastaug kernel, single
               thread and through the DataLoader thread pool at several
               worker counts;

  serving arm  per-image host costs of the streaming engine: .npy load
               vs PNG decode, the fp32 normalize pass vs uint8
               pass-through (device-side normalization), and the
               prediction PNG encode+write.

Each JSON line carries ``host_cores_per_chip``: how many host cores of
this speed one chip needs (required device rate / measured per-core
rate).  This host has ONE core, so multi-worker numbers show overlap,
not scaling — the per-core extrapolation is the honest unit.

Run (no TPU needed; pure host):  python benchmarks/bench_input.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")

TRAIN_IMG_PER_S = 1000.0 / 42.9 * 2  # joint step, batch 2 (README)
SERVE_IMG_PER_S = 34.5               # bf16 artifact path (benchmarks/README)


def make_scene(rng, h: int, w: int, n_classes: int = 34):
    """Structured synthetic scene (voronoi regions + per-region color +
    mild texture): PNG-compressible like real street scenes — pure
    noise would inflate PNG decode/encode costs ~5x and misstate the
    host budget."""
    k = 24
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    cy = rng.integers(0, h, k)
    cx = rng.integers(0, w, k)
    cls = rng.integers(0, n_classes, k).astype(np.uint8)
    d2 = (ys[None] - cy[:, None, None]).astype(np.int64) ** 2 + \
        (xs[None] - cx[:, None, None]).astype(np.int64) ** 2
    region = np.argmin(d2, axis=0)
    label = cls[region]
    colors = rng.integers(0, 256, (k, 3)).astype(np.int16)
    img = colors[region]
    img = img + rng.integers(-8, 9, (h, w, 1), dtype=np.int16)  # texture
    return np.clip(img, 0, 255).astype(np.uint8), label


def make_synthetic_cityscapes(root: str, n: int = 8,
                              h: int = 1024, w: int = 2048) -> list:
    """Preprocessed-format tree: img_with_margin_0/train + annotations."""
    rng = np.random.default_rng(0)
    img_dir = os.path.join(root, "img_with_margin_0", "train")
    ann_dir = os.path.join(root, "annotations", "train")
    os.makedirs(img_dir)
    os.makedirs(ann_dir)
    ids = [f"img{i:03d}" for i in range(n)]
    for i in ids:
        img, label = make_scene(rng, h, w)
        np.save(os.path.join(img_dir, i + ".npy"), img)
        np.save(os.path.join(ann_dir, i + ".npy"), label)
    with open(os.path.join(root, "all_images.json"), "w") as fp:
        json.dump({"train": ids}, fp)
    return ids


def bench_train_arm(root: str, samples: int, workers_list) -> None:
    from scaleprotoseg_tpu.data.dataset import PatchClassificationDataset
    from scaleprotoseg_tpu.data.loader import DataLoader

    def build(native):
        return PatchClassificationDataset(
            "train", is_eval=False, data_type="cityscapes",
            mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225],
            image_margin_size=0, window_size=(513, 513),
            scales=(0.5, 1.5), root=root, native=native)

    arms = [("numpy", build(False))]
    try:
        arms.append(("fastaug", build(True)))
    except RuntimeError as e:
        print(json.dumps({"metric": "train_aug", "arm": "fastaug",
                          "error": str(e)}), flush=True)

    rates = {}
    for name, ds in arms:
        n = len(ds)
        for i in range(min(4, n)):   # touch files: page cache + warm lib
            ds[i]
        t0 = time.perf_counter()
        for i in range(samples):
            ds[i % n]
        dt = time.perf_counter() - t0
        rate = samples / dt
        rates[name] = rate
        print(json.dumps({
            "metric": "train_aug", "arm": name, "threads": 1,
            "img_per_s": round(rate, 1),
            "ms_per_img": round(dt / samples * 1e3, 2),
            "required_img_per_s": round(TRAIN_IMG_PER_S, 1),
            "host_cores_per_chip": round(TRAIN_IMG_PER_S / rate, 2),
        }), flush=True)
    if "fastaug" in rates:
        print(json.dumps({"metric": "train_aug_speedup_fastaug_vs_numpy",
                          "value": round(rates["fastaug"] / rates["numpy"],
                                         2)}), flush=True)

    # through the DataLoader pool (batch 2, the train shape).  On this
    # 1-core host extra workers only overlap IO with compute; the
    # per-core number above is the scaling unit.
    _, ds = arms[-1]
    for nw in workers_list:
        loader = DataLoader(ds, batch_size=2, shuffle=True,
                            num_workers=nw, drop_last=True)
        n_img = 0
        for _ in loader:          # warm epoch (thread spin-up)
            break
        t0 = time.perf_counter()
        for _ in range(2):
            for imgs, _labels in loader:
                n_img += imgs.shape[0]
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": "train_loader", "arm": arms[-1][0],
            "workers": nw, "batch": 2,
            "img_per_s": round(n_img / dt, 1),
            "required_img_per_s": round(TRAIN_IMG_PER_S, 1),
        }), flush=True)

    # grain backend (data/grain_loader.py): same sampled stream,
    # grain's read/prefetch engine — the number a user choosing
    # `loader_backend='grain'` should expect vs the threaded default.
    # grain_loader defers `import grain` to iteration time, so probe
    # for the optional package itself, not the wrapper module
    import importlib.util
    if importlib.util.find_spec("grain") is None:
        return
    from scaleprotoseg_tpu.data.grain_loader import GrainDataLoader
    for nw in workers_list[-1:]:
        loader = GrainDataLoader(ds, batch_size=2, shuffle=True,
                                 num_workers=nw, drop_last=True)
        n_img = 0
        for _ in loader:
            break
        t0 = time.perf_counter()
        for _ in range(2):
            for imgs, _labels in loader:
                n_img += imgs.shape[0]
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": "train_loader_grain", "arm": arms[-1][0],
            "workers": nw, "batch": 2,
            "img_per_s": round(n_img / dt, 1),
        }), flush=True)


def bench_serving_arm(tmp: str, samples: int) -> None:
    from PIL import Image

    from scaleprotoseg_tpu.serving.serve import _make_preprocess

    rng = np.random.default_rng(1)
    img, pred_src = make_scene(rng, 1024, 2048)
    in_dir = os.path.join(tmp, "serve_in")
    os.makedirs(in_dir)
    np.save(os.path.join(in_dir, "x.npy"), img)
    Image.fromarray(img).save(os.path.join(in_dir, "x.png"))

    cases = [
        ("npy_uint8", "x.npy", False),    # device-side normalize (default)
        ("npy_fp32", "x.npy", True),      # --host-preprocess
        ("png_uint8", "x.png", False),
        ("png_fp32", "x.png", True),
    ]
    for name, fname, normalize in cases:
        pre = _make_preprocess(in_dir, normalize=normalize)
        pre(fname)  # warm page cache / PIL import
        t0 = time.perf_counter()
        for _ in range(samples):
            pre(fname)
        dt = time.perf_counter() - t0
        rate = samples / dt
        print(json.dumps({
            "metric": "serving_decode", "arm": name,
            "img_per_s": round(rate, 1),
            "ms_per_img": round(dt / samples * 1e3, 2),
            "device_img_per_s": SERVE_IMG_PER_S,
            "host_cores_per_chip": round(SERVE_IMG_PER_S / rate, 2),
        }), flush=True)

    # output side: label PNG encode+write vs raw .npy write (structured
    # label map — realistic PNG compressibility)
    pred = (pred_src % 19).astype(np.uint8)
    out_dir = os.path.join(tmp, "serve_out")
    os.makedirs(out_dir)
    for name, write in (
            ("png", lambda p: Image.fromarray(pred).convert("L").save(
                p + ".png")),
            ("npy", lambda p: np.save(p + ".npy", pred))):
        write(os.path.join(out_dir, "warm"))
        t0 = time.perf_counter()
        for i in range(samples):
            write(os.path.join(out_dir, f"p{i}"))
        dt = time.perf_counter() - t0
        rate = samples / dt
        print(json.dumps({
            "metric": "serving_write", "arm": name,
            "img_per_s": round(rate, 1),
            "ms_per_img": round(dt / samples * 1e3, 2),
            "device_img_per_s": SERVE_IMG_PER_S,
            "host_cores_per_chip": round(SERVE_IMG_PER_S / rate, 2),
        }), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--samples", type=int, default=24)
    p.add_argument("--workers", type=int, nargs="+", default=[1, 2, 4])
    args = p.parse_args()
    with tempfile.TemporaryDirectory() as tmp:
        root = os.path.join(tmp, "cityscapes")
        os.makedirs(root)
        make_synthetic_cityscapes(root)
        bench_train_arm(root, args.samples, args.workers)
        bench_serving_arm(tmp, args.samples)


if __name__ == "__main__":
    main()
