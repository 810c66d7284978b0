from refid_tpu.train.losses import (
    charbonnier_loss, l1_loss, mse_loss, psnr_loss, build_loss,
)
from refid_tpu.train.schedules import build_schedule

__all__ = [
    "charbonnier_loss", "l1_loss", "mse_loss", "psnr_loss", "build_loss",
    "build_schedule",
]
