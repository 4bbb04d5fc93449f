from .mv_raster import rasterize_frame_mvs, rasterize_clip
from .qp_slice import QpSliceLookup

__all__ = ["rasterize_frame_mvs", "rasterize_clip", "QpSliceLookup"]
