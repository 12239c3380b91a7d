"""ScaleProtoSeg-TPU: a TPU-native JAX framework for multi-scale grouped
prototype semantic segmentation.

Re-implements the full capability surface of eceo-epfl/ScaleProtoSeg
(WACV 2025, "Multi-Scale Grouped Prototypes for Interpretable Semantic
Segmentation") as an idiomatic JAX/XLA/Pallas framework:

- NHWC bf16/fp32 conv stacks compiled by XLA onto the MXU,
- a fused prototype-distance kernel (Pallas) for the hot inference path,
- dense masked loss formulations replacing the reference's Python loops,
- `jax.sharding.Mesh`-based data parallelism for multi-chip scaling,
- on-device `lax.scan` prototype push instead of per-image host loops.

Reference layout is documented in SURVEY.md at the repo root; reference
file:line citations appear in docstrings throughout.
"""

__version__ = "0.1.0"
