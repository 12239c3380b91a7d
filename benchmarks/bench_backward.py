"""Training-step decomposition: where does the backward pass go?

Round-2 VERDICT weak #1: inference runs at ~64% MFU but the cityscapes
joint train step measured ~30% — with nothing profiling the backward.
This benchmark decomposes the flagship joint step at the real config
shape (bf16, 513x513, batch 2) into measured variants:

  fwd_loss        forward + loss only (no grad)
  step_xla        full train step, XLA shifted-matmul ASPP (the default)
  step_fast       full train step, fused Pallas ASPP fwd + custom VJP
  step_nokld      full step with KLD weight 0 (isolates the KLD cost)
  step_headonly   grads w.r.t. prototypes+last layer only (no backbone
                  backward: isolates the conv backward cost)
  step_remat      full step with the backbone rematerialized
                  (jax.checkpoint; trades HBM for recompute)

Round-4 additions at the shipped TPU recipe point (fast_aspp +
fast_gradconv):
  step_recipe          the full recipe step (the 38.8 ms headline)
  grads_recipe         grads only, no optimizer update (isolates the
                       Adam/multi-transform update + param write cost)
  step_recipe_headonly head-only grads under the recipe (isolates the
                       backbone backward residue for the next kernel)
  grads_to_*           per-layer backward localization: grads w.r.t.
                       cumulative param subsets (head, +aspp, +layer5,
                       ... +layer1) — consecutive deltas price each
                       layer's backward slice (see 5c below)

Each line carries XLA cost-analysis FLOPs so ms translate to TFLOP/s.
Run on the real TPU chip: python benchmarks/bench_backward.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

# metric name -> --sections tag (grads_to_* rows are section "layers")
_SECTION_OF = {
    "fwd_loss": "fwd", "step_xla": "steps", "step_fast": "steps",
    "step_xla_remat": "steps", "step_fast_remat": "steps",
    "step_nokld": "steps", "step_headonly": "steps",
    "step_recipe": "recipe", "step_recipe_headonly": "recipe",
    "grads_recipe": "recipe", "grads_remat_full_model": "remat",
}


def main(sections=("all",)):
    import jax
    import jax.numpy as jnp
    import numpy as np

    def want(tag):
        return "all" in sections or tag in sections

    from scaleprotoseg_tpu import cli_common
    from scaleprotoseg_tpu.models.factory import construct_PPNet
    from scaleprotoseg_tpu.profiling import time_fn_pipelined
    from scaleprotoseg_tpu.train.optim import (
        label_params, make_phase_optimizer, partition_params, phase_groups,
        poly_schedule)
    from scaleprotoseg_tpu.train.runner import module_hparams
    from scaleprotoseg_tpu.train.state import TrainState
    from scaleprotoseg_tpu.train.steps import (
        LossWeights, compute_losses, make_train_step)
    import dataclasses

    cli_common.load_config("scaleproto_cityscapes")
    mhp = module_hparams("multiscale")
    model, spec = construct_PPNet(variant="multiscale", pretrained=False,
                                  dtype=jnp.bfloat16)
    h = w = 513
    batch = 2
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, h, w, 3), jnp.bfloat16)),
        jax.random.PRNGKey(0))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((batch, h, w, 3)), jnp.bfloat16)
    tgt = jnp.asarray(rng.integers(0, spec.num_classes + 1, (batch, h, w)),
                      jnp.int32)

    def build_state_step(m, weights, trainable_only=None, remat=False):
        groups = phase_groups("multiscale", 1, mhp["hp"])
        if trainable_only is not None:
            groups = {k: v for k, v in groups.items()
                      if k in trainable_only}
        trainable, _ = partition_params(variables["params"], set(groups))
        tx = make_phase_optimizer(groups, label_params(trainable),
                                  schedule=poly_schedule(0.9, 30000))
        state = TrainState.create(variables["params"],
                                  variables.get("batch_stats"),
                                  tx.init(trainable))
        step = make_train_step(m, spec, tx, set(groups), weights,
                               donate=False, remat=remat)
        return state, step

    weights = mhp["weights"]

    def timed(name, fn, *args):
        sec = _SECTION_OF.get(
            name, "layers" if name.startswith("grads_to_") else "all")
        if not want(sec):
            return None
        rate = time_fn_pipelined(fn, *args, iters=8)
        rec = {"metric": name, "ms": round(1e3 / rate, 2)}
        try:
            cost = jax.jit(fn).lower(*args).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0))
            if flops:
                rec["tflops_per_s"] = round(flops * rate / 1e12, 1)
                rec["gflops"] = round(flops / 1e9, 1)
            # HBM roofline side: XLA's modeled bytes moved.  gb_per_s
            # near the chip's HBM bandwidth (v5e ~819 GB/s) marks a
            # bandwidth-bound row — the layer1-3 backward tail's proof.
            bytes_ = float(cost.get("bytes accessed", 0.0))
            if bytes_:
                rec["gbytes"] = round(bytes_ / 1e9, 2)
                rec["gb_per_s"] = round(bytes_ * rate / 1e9, 0)
        except Exception:
            pass
        print(json.dumps(rec), flush=True)
        return rec

    # 1. forward + loss only
    @jax.jit
    def fwd_loss(variables, img, tgt):
        outputs = model.apply(variables, img, train=True)
        loss, _ = compute_losses(model, spec, variables["params"], outputs,
                                 tgt, weights, True)
        return loss

    timed("fwd_loss", fwd_loss, variables, img, tgt)

    # 2. full step, XLA ASPP
    state, step = build_state_step(model, weights)
    timed("step_xla", lambda s, i, t: step(s, i, t)[1]["loss"],
          state, img, tgt)

    # 3. full step, fused Pallas ASPP (custom VJP)
    fast_model = dataclasses.replace(
        model, backbone=dataclasses.replace(model.backbone,
                                            fast_aspp=True))
    state_f, step_f = build_state_step(fast_model, weights)
    timed("step_fast", lambda s, i, t: step_f(s, i, t)[1]["loss"],
          state_f, img, tgt)

    # 3b. remat variants of the full step
    state_r, step_r = build_state_step(model, weights, remat=True)
    timed("step_xla_remat", lambda s, i, t: step_r(s, i, t)[1]["loss"],
          state_r, img, tgt)
    state_fr, step_fr = build_state_step(fast_model, weights, remat=True)
    timed("step_fast_remat", lambda s, i, t: step_fr(s, i, t)[1]["loss"],
          state_fr, img, tgt)

    # 4. KLD cost
    state_n, step_n = build_state_step(
        model, dataclasses.replace(weights, kld=0.0))
    timed("step_nokld", lambda s, i, t: step_n(s, i, t)[1]["loss"],
          state_n, img, tgt)

    # 5. head-only grads (no backbone backward)
    state_h, step_h = build_state_step(
        model, weights, trainable_only={"prototypes"})
    timed("step_headonly", lambda s, i, t: step_h(s, i, t)[1]["loss"],
          state_h, img, tgt)

    # 5b. round-4 recipe-point decomposition
    recipe_model = dataclasses.replace(
        model, backbone=dataclasses.replace(model.backbone,
                                            fast_aspp=True,
                                            fast_gradconv=True))
    state_rc, step_rc = build_state_step(recipe_model, weights)
    timed("step_recipe", lambda s, i, t: step_rc(s, i, t)[1]["loss"],
          state_rc, img, tgt)
    state_rh, step_rh = build_state_step(
        recipe_model, weights, trainable_only={"prototypes"})
    timed("step_recipe_headonly",
          lambda s, i, t: step_rh(s, i, t)[1]["loss"], state_rh, img, tgt)

    groups_rc = phase_groups("multiscale", 1, mhp["hp"])

    @jax.jit
    def grads_recipe(state, img, tgt):
        from scaleprotoseg_tpu.train.optim import merge_params
        trainable, frozen = partition_params(state.params, set(groups_rc))

        def loss_fn(trainable_p):
            params = merge_params(trainable_p, frozen)
            v = {"params": params}
            if state.batch_stats is not None:
                v["batch_stats"] = state.batch_stats
            outputs = recipe_model.apply(v, img, train=True)
            loss, _ = compute_losses(recipe_model, spec, params, outputs,
                                     tgt, weights, True)
            return loss

        g = jax.grad(loss_fn)(trainable)
        # reduce over EVERY leaf: returning one element would let XLA
        # dead-code-eliminate the rest of the backward
        return sum(jnp.vdot(l, l) for l in jax.tree.leaves(g))

    timed("grads_recipe", grads_recipe, state_rc, img, tgt)

    # 5c. per-layer backward localization (recipe point).  Grads w.r.t.
    # CUMULATIVE param subsets, innermost-first: differentiating only
    # down to layer K lets XLA dead-code-eliminate every dX/dW below it,
    # so consecutive row deltas price each layer's backward slice
    # (its dW plus the dX hop that feeds the next row) on top of the
    # shared forward.  Localizes the backbone-backward residue that
    # step_recipe - step_recipe_headonly only reports in aggregate.
    # Subsets respect the REAL joint-phase trainable labels (BN affine
    # is frozen, `phase_groups`): an earlier draft differentiated BN
    # scale/bias too and inflated the outer-layer rows ~15%.
    from flax import traverse_util

    from scaleprotoseg_tpu.train.optim import label_of_path

    joint_labels = set(phase_groups("multiscale", 1, mhp["hp"]))
    cumulative = [("head", None), ("+aspp", "aspp"),
                  ("+layer5", "layer5"), ("+layer4", "layer4"),
                  ("+layer3", "layer3"), ("+layer2", "layer2"),
                  ("+layer1", "layer1")]
    flat_all = traverse_util.flatten_dict(variables["params"])
    included = set()

    for name, sub in cumulative:
        if sub is not None:
            included.add(sub)
        inc = frozenset(included)

        def pick(key, inc=inc):
            if label_of_path(key) not in joint_labels:
                return False            # e.g. BN affine: frozen in joint
            if key[0] != "backbone":
                return True             # head params: always trainable
            return key[1] in inc

        train_f = {k: v for k, v in flat_all.items() if pick(k)}
        frozen_f = {k: v for k, v in flat_all.items() if not pick(k)}
        trainable = traverse_util.unflatten_dict(train_f)
        frozen = traverse_util.unflatten_dict(frozen_f)

        @jax.jit
        def grads_subset(trainable, img, tgt, frozen=frozen):
            from scaleprotoseg_tpu.train.optim import merge_params

            def loss_fn(trainable_p):
                params = merge_params(trainable_p, frozen)
                v = {"params": params}
                if variables.get("batch_stats") is not None:
                    v["batch_stats"] = variables["batch_stats"]
                outputs = recipe_model.apply(v, img, train=True)
                loss, _ = compute_losses(recipe_model, spec, params,
                                         outputs, tgt, weights, True)
                return loss

            g = jax.grad(loss_fn)(trainable)
            return sum(jnp.vdot(l, l) for l in jax.tree.leaves(g))

        timed(f"grads_to_{name}", grads_subset, trainable, img, tgt)

    # 6. remat the backbone
    remat_backbone = jax.checkpoint(
        lambda m, v, x: m.apply(v, x, train=True),
        static_argnums=(0,))

    @jax.jit
    def step_remat(state, img, tgt):
        groups = phase_groups("multiscale", 1, mhp["hp"])
        trainable, frozen = partition_params(state.params, set(groups))

        def loss_fn(trainable_p):
            from scaleprotoseg_tpu.train.optim import merge_params
            params = merge_params(trainable_p, frozen)
            v = {"params": params}
            if state.batch_stats is not None:
                v["batch_stats"] = state.batch_stats
            outputs = remat_backbone(model, v, img)
            loss, _ = compute_losses(model, spec, params, outputs, tgt,
                                     weights, True)
            return loss

        return jax.grad(loss_fn)(trainable)

    timed("grads_remat_full_model", step_remat, state, img, tgt)


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--sections", default="all",
                   help="comma list of fwd,steps,recipe,layers,remat "
                   "(default: all)")
    main(tuple(p.parse_args().sections.split(",")))
