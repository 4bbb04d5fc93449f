from .warp import flow_warp
from .dynamic_conv import mix_expert_kernels, dynamic_conv2d, conv2d_nhwc
from .upsample import pixel_shuffle, bilinear_resize

__all__ = [
    "flow_warp",
    "mix_expert_kernels",
    "dynamic_conv2d",
    "conv2d_nhwc",
    "pixel_shuffle",
    "bilinear_resize",
]
