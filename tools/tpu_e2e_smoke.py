"""End-to-end training smoke on the REAL TPU chip.

The e2e pipeline tests (tests/test_e2e_train.py, test_e2e_group.py) run
on the CPU backend under pytest; this script runs the same full
prototype-phase CLI pipeline (warmup -> joint -> push -> last-layer,
incl. checkpointing, metrics sinks, and the push artifact family) on the
hosted TPU — proving the production path end-to-end on real hardware:
device-side training with bulk metric fetches, the async-tunnel sync
semantics (CLAUDE.md "Environment gotchas"), and the persistent compile
cache.

Usage:  python tools/tpu_e2e_smoke.py          # on the TPU host
Prints one JSON line: {"ok": true, "backend": ..., "wall_s": ...,
"final_val_accuracy": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main() -> int:
    work = tempfile.mkdtemp(prefix="tpu_e2e_")
    os.environ["RESULTS_DIR"] = os.path.join(work, "results")
    os.environ["LOG_DIR"] = os.path.join(work, "logs")

    from e2e_utils import TINY_EM_CONFIG, build_synthetic_dataset

    import jax

    backend = jax.default_backend()
    dataset_root = build_synthetic_dataset(os.path.join(work, "data"))
    cfg = os.path.join(work, "tiny_em.gin")
    with open(cfg, "w") as f:
        f.write(TINY_EM_CONFIG)

    from scaleprotoseg_tpu.train_wandb_multiscale import train

    t0 = time.time()
    final = train(cfg, "tpu_e2e_smoke", data_root=dataset_root,
                  num_workers=2)
    wall = time.time() - t0

    assert os.path.exists(final), final
    results_dir = os.path.dirname(os.path.dirname(final))
    ckpt_dir = os.path.join(results_dir, "checkpoints")
    for name in ("nopush_last.ckpt", "push_last.ckpt", "push_final.ckpt"):
        assert os.path.exists(os.path.join(ckpt_dir, name)), name
    with open(os.path.join(results_dir, "prototypes",
                           "unique_prototypes.json")) as f:
        unique = json.load(f)
    assert len(unique) >= 1
    with open(os.path.join(results_dir, "metrics.jsonl")) as f:
        records = [json.loads(line) for line in f]
    accs = [r["val_accuracy"] for r in records if "val_accuracy" in r]
    assert accs, "no val_accuracy logged"

    print(json.dumps({
        "ok": True, "backend": backend, "wall_s": round(wall, 1),
        "final_val_accuracy": round(float(accs[-1]), 4),
        "n_metric_records": len(records), "results_dir": results_dir,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
