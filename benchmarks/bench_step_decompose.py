"""Per-layer training-step decomposition at ANY config's real shapes.

bench_backward.py localizes the flagship (cityscapes, 513x513 b2)
backward; VERDICT r4 weak #3 noted the other shape regimes — EM
(UNet-ASPP, 512x512 b2, full-res prototype grid) and COCO
(ResNet-101 MSC, 321x321 b10, C=182) — ship recipe numbers with no
decomposition at all.  This bench runs the same cumulative-subset
localization against any shipped config:

  fwd_loss      forward + loss only
  grads_full    grads w.r.t. every joint-phase group (no optimizer)
  step          the full train step (nondonated; bench_configs.py owns
                the donated-chain headline)
  grads_to_*    cumulative param subsets, innermost-first along the
                backward dataflow; consecutive deltas price each
                section's backward slice (dW + the dX hop feeding the
                next row) on top of the shared forward.

Section chains are derived from the backbone param tree:
  resnet deeplab   head, +aspp, +layer5 ... +layer1
  unet_aspp        head, +aspp, +up4 ... +up1, +down4 ... +inc
Subsets respect the REAL joint-phase trainable labels (frozen BN
affine stays frozen — see bench_backward.py's note on the 15% skew).

CAVEAT (r5, measured at EM): subset rows can OVER-price a slice.  With
the body frozen, XLA schedules the ASPP dW reductions without the
body-backward dataflow to fuse against: the EM "+aspp" row reads
32.8 ms while swapping the ENTIRE ASPP backward form in the full step
(XLA AD vs the tap-packed VJP) moves the step < 0.2 ms — and the EM
grads_full row (89 ms, nondonated + per-leaf vdot reduce) exceeds the
real donated step (79 ms).  The flagship rows close (bench_backward.py)
but treat UNet rows as relative hints; bench_trace_step.py is the
ground truth for where a step's time goes.

Run on the real TPU chip:
    python benchmarks/bench_step_decompose.py --config scaleproto_em \
        [--recipe] [--sections fwd,steps,layers] [--iters 8]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "benchmarks")


def section_chain(params: dict) -> list:
    """Cumulative (row_name, [backbone path prefixes]) along backward
    dataflow, derived from the backbone param tree."""
    bb = params.get("backbone", {})
    keys = set(bb)
    if "body" in keys:  # unet / unet_aspp
        body = [("up4",), ("up3",), ("up2",), ("up1",),
                ("down4",), ("down3",), ("down2",), ("down1",), ("inc",)]
        chain = [("head", [])]
        if "aspp" in keys:
            chain.append(("+aspp", [("aspp",)]))
        chain += [(f"+{b[0]}", [("body",) + b]) for b in body
                  if b[0] in bb.get("body", {})]
        return chain
    # resnet deeplab: layer5 is the final dilated block, aspp the head
    chain = [("head", [])]
    for k in ("aspp", "layer5", "layer4", "layer3", "layer2", "layer1"):
        if k in keys:
            chain.append((f"+{k}", [(k,)]))
    return chain


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="scaleproto_em")
    p.add_argument("--recipe", action="store_true",
                   help="bf16 + fast_aspp + fast_gradconv (the TPU "
                   "training recipe)")
    p.add_argument("--sections", default="all",
                   help="comma list of fwd,steps,layers (default all)")
    p.add_argument("--iters", type=int, default=8)
    a = p.parse_args()
    sections = tuple(a.sections.split(","))

    def want(tag):
        return "all" in sections or tag in sections

    import jax
    import jax.numpy as jnp

    from common_build import build_from_config
    from scaleprotoseg_tpu.profiling import time_fn_pipelined
    from scaleprotoseg_tpu.train.optim import (label_of_path, merge_params,
                                               partition_params)
    from scaleprotoseg_tpu.train.steps import compute_losses

    b = build_from_config(a.config, fast_gradconv=a.recipe,
                          fast_aspp=a.recipe, dtype=jnp.bfloat16)
    model, spec, variables, weights = (b.model, b.spec, b.variables,
                                       b.mhp["weights"])
    print(json.dumps({"config": a.config, "recipe": a.recipe,
                      "variant": b.variant, "batch": b.batch,
                      "window": list(b.window),
                      "num_prototypes": spec.num_prototypes,
                      "num_classes": spec.num_classes}), flush=True)

    def timed(name, fn, *args):
        rate = time_fn_pipelined(fn, *args, iters=a.iters)
        rec = {"metric": name, "ms": round(1e3 / rate, 2)}
        try:
            cost = jax.jit(fn).lower(*args).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0))
            if flops:
                rec["tflops_per_s"] = round(flops * rate / 1e12, 1)
                rec["gflops"] = round(flops / 1e9, 1)
            bytes_ = float(cost.get("bytes accessed", 0.0))
            if bytes_:
                rec["gbytes"] = round(bytes_ / 1e9, 2)
                rec["gb_per_s"] = round(bytes_ * rate / 1e9, 0)
        except Exception:
            pass
        print(json.dumps(rec), flush=True)
        return rec

    ignore_void = b.mhp["ignore_void_class"]

    if want("fwd"):
        @jax.jit
        def fwd_loss(variables, img, tgt):
            outputs = model.apply(variables, img, train=True)
            loss, _ = compute_losses(model, spec, variables["params"],
                                     outputs, tgt, weights, ignore_void)
            return loss

        timed("fwd_loss", fwd_loss, variables, b.img, b.tgt)

    if want("steps"):
        timed("step", lambda s, i, t: b.step(s, i, t)[1]["loss"],
              b.state, b.img, b.tgt)

    if not want("layers"):
        return

    from flax import traverse_util

    joint_labels = set(b.groups)
    flat_all = traverse_util.flatten_dict(variables["params"])
    included: list = []

    for row_name, prefixes in section_chain(variables["params"]):
        included.extend(prefixes)
        inc = tuple(included)

        def pick(key, inc=inc):
            if label_of_path(key) not in joint_labels:
                return False          # e.g. frozen BN affine
            if key[0] != "backbone":
                return True           # head params: always trainable
            return any(key[1:1 + len(p)] == p for p in inc)

        train_f = {k: v for k, v in flat_all.items() if pick(k)}
        frozen_f = {k: v for k, v in flat_all.items() if not pick(k)}
        if not train_f:
            continue
        trainable = traverse_util.unflatten_dict(train_f)
        frozen = traverse_util.unflatten_dict(frozen_f)

        @jax.jit
        def grads_subset(trainable, img, tgt, frozen=frozen):
            def loss_fn(trainable_p):
                params = merge_params(trainable_p, frozen)
                v = {"params": params}
                if variables.get("batch_stats") is not None:
                    v["batch_stats"] = variables["batch_stats"]
                outputs = model.apply(v, img, train=True)
                loss, _ = compute_losses(model, spec, params, outputs,
                                         tgt, weights, ignore_void)
                return loss

            g = jax.grad(loss_fn)(trainable)
            # reduce over EVERY leaf: one element would let XLA DCE
            # the rest of the backward
            return sum(jnp.vdot(l, l) for l in jax.tree.leaves(g))

        timed(f"grads_to_{row_name}", grads_subset, trainable, b.img,
              b.tgt)

    # full-tree grads for the closure check (layers rows should sum
    # toward this, modulo the optimizer update step)
    if want("layers"):
        trainable, frozen = partition_params(variables["params"],
                                             joint_labels)

        @jax.jit
        def grads_full(trainable, img, tgt):
            def loss_fn(trainable_p):
                params = merge_params(trainable_p, frozen)
                v = {"params": params}
                if variables.get("batch_stats") is not None:
                    v["batch_stats"] = variables["batch_stats"]
                outputs = model.apply(v, img, train=True)
                loss, _ = compute_losses(model, spec, params, outputs,
                                         tgt, weights, ignore_void)
                return loss

            g = jax.grad(loss_fn)(trainable)
            return sum(jnp.vdot(l, l) for l in jax.tree.leaves(g))

        timed("grads_full", grads_full, trainable, b.img, b.tgt)


if __name__ == "__main__":
    main()
