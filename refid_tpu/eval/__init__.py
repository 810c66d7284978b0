from refid_tpu.eval.metrics import calculate_psnr, calculate_ssim

__all__ = ["calculate_psnr", "calculate_ssim"]
