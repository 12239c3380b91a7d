"""Push-scan benchmark: the dataset-wide masked-min pass on the chip.

The push hot loop (SURVEY.md §3.3) is one forward + per-prototype masked
min over every training image.  The reference runs it at batch 1 on GPU
with per-prototype re-encodes; here it is one jitted batched scan, and
with a mesh it shards image-per-chip (push_prototypes(mesh=...)).  This
bench measures the single-chip scan at Cityscapes full resolution for
several batch sizes — the before/after for batching the scan.

Run on the real TPU chip:  python benchmarks/bench_push.py
Prints one JSON line per batch size.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship
    from scaleprotoseg_tpu.profiling import time_fn_pipelined
    from scaleprotoseg_tpu.push.push import _make_min_step

    model, spec = _flagship(tiny=False, grouped=True)
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 129, 129, 3), jnp.bfloat16)),
        jax.random.PRNGKey(0))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    min_step = _make_min_step(model, spec)

    rng = np.random.default_rng(0)
    data = rng.random((4, 1024, 2048, 3)).astype(np.float32)
    labels = rng.integers(0, 20, (4, 1024, 2048)).astype(np.int32)

    for batch in (1, 2, 4):
        img = jnp.asarray(data[:batch], jnp.bfloat16)
        tgt = jnp.asarray(labels[:batch])

        def one(variables, img, tgt):
            vals, row, flat_idx = min_step(variables, img, tgt)
            return vals

        rate = time_fn_pipelined(one, variables, img, tgt, iters=8)
        print(json.dumps({
            "metric": "push_min_scan_1024x2048",
            "batch": batch,
            "value": round(batch * rate, 2),
            "unit": "images/sec/chip",
            "ms_per_image": round(1e3 / (batch * rate), 2),
        }), flush=True)


if __name__ == "__main__":
    main()
