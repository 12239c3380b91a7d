from scaleprotoseg_tpu.push.push import (  # noqa: F401
    PushResult, prune_model_params, push_prototypes)
