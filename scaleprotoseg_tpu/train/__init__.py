from scaleprotoseg_tpu.train.optim import (  # noqa: F401
    OptimGroup, label_params, make_phase_optimizer, poly_schedule,
    phase_groups)
from scaleprotoseg_tpu.train.state import TrainState  # noqa: F401
