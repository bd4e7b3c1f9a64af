from .fid import frechet_distance, StreamingMoments, d_fid_from_moments
from .ssim import psnr, ssim, ms_ssim
from .stats import OnlineVariance

__all__ = ["frechet_distance", "StreamingMoments", "d_fid_from_moments",
           "psnr", "ssim", "ms_ssim", "OnlineVariance"]
