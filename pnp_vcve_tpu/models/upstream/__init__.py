from .generation import PatchDiscriminator, ResnetGenerator, UnetGenerator
from .inpainting import GLEncoderDecoder
from .matting import DIMMattor, PlainRefiner
from .stylegan2 import StyleGAN2Discriminator, StyleGAN2Generator
from .vfi import CAINNet

__all__ = [
    "ResnetGenerator",
    "UnetGenerator",
    "PatchDiscriminator",
    "GLEncoderDecoder",
    "DIMMattor",
    "PlainRefiner",
    "StyleGAN2Generator",
    "StyleGAN2Discriminator",
    "CAINNet",
]
