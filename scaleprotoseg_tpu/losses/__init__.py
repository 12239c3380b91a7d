from scaleprotoseg_tpu.losses.losses import (  # noqa: F401
    cross_entropy_group_loss,
    entropy_group_loss,
    entropy_sampl_loss,
    entropy_spat_loss,
    kld_group_loss,
    kld_loss,
    last_layer_l1,
    norm_loss,
    pixel_wise_cross_entropy,
    scale_max_loss,
)
