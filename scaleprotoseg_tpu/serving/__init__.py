"""Production serving: AOT export + pipelined streaming inference.

The reference has no serving story beyond its eval scripts (predictions
fall out of ``eval_test.py``'s benchmark-export loop).  On TPU a
deployable artifact is natural: ``jax.export`` serializes the jitted
forward to versioned StableHLO that a serving host can load WITHOUT the
model code, Python config stack, or a recompile-from-trace — only the
weights ride alongside.  ``ServingEngine`` then drives any predict
callable at device speed by overlapping host-side decode/preprocess and
device->host fetches with TPU compute.

Surface:
  export.export_serving / save_artifact / load_artifact / export_from_run
  engine.ServingEngine
  python -m scaleprotoseg_tpu.serving.serve  (CLI)
"""

from scaleprotoseg_tpu.serving.engine import ServingEngine  # noqa: F401
from scaleprotoseg_tpu.serving.export import (  # noqa: F401
    export_from_run, export_serving, load_artifact, make_mesh_predict,
    make_serving_fn, save_artifact)
