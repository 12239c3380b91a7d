"""Training-step benchmark: flagship joint-phase step throughput.

Run on the real TPU chip:  python benchmarks/bench_train.py

Measures the full jitted joint-phase training step (CE + KLD + L1,
gradients over backbone/prototypes/add-ons, Adam + poly LR) at the
Cityscapes config shapes (batch 2, 513x513).  Prints one JSON line.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scaleprotoseg_tpu.models.deeplab import DeepLabV2
    from scaleprotoseg_tpu.models.ppnet import PPNet
    from scaleprotoseg_tpu.profiling import time_fn_pipelined
    from scaleprotoseg_tpu.spec import ProtoSpec
    from scaleprotoseg_tpu.train.optim import (label_params,
                                               make_phase_optimizer,
                                               partition_params,
                                               phase_groups, poly_schedule)
    from scaleprotoseg_tpu.train.state import TrainState
    from scaleprotoseg_tpu.train.steps import LossWeights, make_train_step

    spec = ProtoSpec.equal_allocation(228, 64, 19, 4)
    model = PPNet(
        backbone=DeepLabV2(n_out=64, n_blocks=(3, 4, 23, 3),
                           aspp_mode="concat", dtype=jnp.bfloat16),
        spec=spec, backbone_channels=256, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((2, 513, 513, 3), jnp.bfloat16)),
        jax.random.PRNGKey(0))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    hp = dict(warm_lr_add_on=2.5e-4, warm_lr_protos=2.5e-4, warm_wd=5e-4,
              joint_lr_features=2.5e-5, joint_lr_add_on=2.5e-4,
              joint_lr_protos=2.5e-4, joint_wd=5e-4, last_layer_lr=2.5e-4,
              warm_lr_group=2.5e-4, joint_lr_group=2.5e-4)
    groups = phase_groups("multiscale", 1, hp)
    trainable, _ = partition_params(variables["params"], set(groups))
    tx = make_phase_optimizer(groups, label_params(trainable),
                              schedule=poly_schedule(0.9, 30000))
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats"),
                              tx.init(trainable))
    step = make_train_step(model, spec, tx, set(groups),
                           LossWeights(kld=0.25, l1=1e-4), donate=False)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((2, 513, 513, 3)), jnp.bfloat16)
    tgt = jnp.asarray(rng.integers(0, 20, (2, 513, 513)), jnp.int32)

    def one(state, img, tgt):
        _, metrics = step(state, img, tgt)
        return metrics["loss"]

    rate = time_fn_pipelined(one, state, img, tgt, iters=10)
    print(json.dumps({
        "metric": "cityscapes_joint_train_step",
        "value": round(1e3 / rate, 2),
        "unit": "ms/step (batch 2, 513x513, CE+KLD)",
        "img_per_s": round(2 * rate, 2),
    }))


if __name__ == "__main__":
    main()
