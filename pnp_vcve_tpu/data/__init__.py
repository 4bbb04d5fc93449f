from .compose import Compose, PIPELINES
from .mv_raster import rasterize_frame_mvs, rasterize_clip
from .qp_slice import QpSliceLookup

__all__ = [
    "Compose",
    "PIPELINES",
    "rasterize_frame_mvs",
    "rasterize_clip",
    "QpSliceLookup",
]
