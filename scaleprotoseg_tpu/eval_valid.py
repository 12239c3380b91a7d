"""Validation evaluation for single-scale (ProtoSeg baseline) runs.

CLI parity with `python -m segmentation.eval_valid` (ref eval_valid.py).
The unified evaluation engine auto-detects the model variant from the
checkpoint, so this is a thin alias of ``eval_valid_multiscale``.
"""

from scaleprotoseg_tpu.eval_valid_multiscale import (  # noqa: F401
    main, run_evaluation)

if __name__ == "__main__":
    main()
