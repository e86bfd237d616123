from uegan_tpu.metrics.psnr import psnr_batch, calc_psnr
from uegan_tpu.metrics.ssim import ssim_batch, calc_ssim
from uegan_tpu.metrics.nima import nima_scores, calc_nima

__all__ = [
    "psnr_batch",
    "calc_psnr",
    "ssim_batch",
    "calc_ssim",
    "nima_scores",
    "calc_nima",
]
