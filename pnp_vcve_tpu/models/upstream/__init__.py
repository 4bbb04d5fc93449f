from .generation import PatchDiscriminator, ResnetGenerator, UnetGenerator
from .inpainting import GLEncoderDecoder
from .matting import DIMMattor, PlainRefiner
from .stylegan2 import StyleGAN2Discriminator, StyleGAN2Generator
from .vfi import CAINNet
from .glean import GLEANStyleGANv2
from .liif import LIIFEDSR, make_coord
from .ttsr import LTE, TTSRNet, search_transformer
from .dic import DICNet, FeedbackHourglass, reduce_to_five_heatmaps

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
    "GLEANStyleGANv2",
    "LIIFEDSR",
    "TTSRNet",
    "LTE",
    "search_transformer",
    "DICNet",
    "FeedbackHourglass",
    "reduce_to_five_heatmaps",
]
