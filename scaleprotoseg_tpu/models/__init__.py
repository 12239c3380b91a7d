from scaleprotoseg_tpu.models.ppnet import PPNet, PPNetOutput  # noqa: F401
from scaleprotoseg_tpu.models.factory import (  # noqa: F401
    construct_ppnet, construct_PPNet, construct_PPNet_Group)
