from .quality import psnr, ssim, mae, tensor2img, img_as_uint8

__all__ = ["psnr", "ssim", "mae", "tensor2img", "img_as_uint8"]
