from animate_anything_tpu.metrics.motion import (
    latent_motion_score,
    motion_mask_loss,
    get_moved_area_mask,
    calculate_motion_precision,
    calculate_motion_score,
    masked_psnr,
)

__all__ = [
    "latent_motion_score",
    "motion_mask_loss",
    "get_moved_area_mask",
    "calculate_motion_precision",
    "calculate_motion_score",
    "masked_psnr",
]
