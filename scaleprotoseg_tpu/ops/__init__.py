from scaleprotoseg_tpu.ops.prototype import (  # noqa: F401
    distance_to_similarity,
    pairwise_l2,
    scale_l2_distances,
)
from scaleprotoseg_tpu.ops.simplex import projection_simplex_sort  # noqa: F401
from scaleprotoseg_tpu.ops.resize import (  # noqa: F401
    resize_bilinear,
    resize_label_nearest,
    resize_label_nearest_np,
)
