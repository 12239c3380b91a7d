from scaleprotoseg_tpu.checkpoints.io import (  # noqa: F401
    load_checkpoint, save_checkpoint)
