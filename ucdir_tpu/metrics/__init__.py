"""Metrics: in-loop (tensor2img/save/PSNR/SSIM, /root/reference/core/metrics.py)
and BasicSR-grade offline metrics (crop-border/Y-channel PSNR, 3-D Gaussian
SSIM, NIQE; /root/reference/metric/)."""
from ucdir_tpu.metrics.core import (tensor2img, save_img, save_jpg,
                                    calculate_psnr, calculate_ssim)
