from scaleprotoseg_tpu.data.dataset import (  # noqa: F401
    PatchClassificationDataset, resize_label)
from scaleprotoseg_tpu.data.loader import DataLoader  # noqa: F401
