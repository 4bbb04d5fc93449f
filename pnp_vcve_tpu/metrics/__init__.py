from .quality import psnr, ssim, mae, l1_evaluation, tensor2img, img_as_uint8
from .niqe import niqe

__all__ = ["psnr", "ssim", "mae", "l1_evaluation", "niqe", "tensor2img", "img_as_uint8"]
