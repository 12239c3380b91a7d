"""CLI parity shim: ``python -m scaleprotoseg_tpu.train <config> <run>``.

The reference ships ``python -m segmentation.train`` (its legacy
single-scale trainer entry, `segmentation/train.py:1-252`); here the
``train`` name is the training package, so this ``__main__`` delegates
to the same pipeline as ``train_wandb`` (the reference's two scripts
differ only in logger wiring — neptune vs wandb — which the
MetricsLogger sinks subsume).
"""

from scaleprotoseg_tpu.train_wandb import main

if __name__ == "__main__":
    main()
