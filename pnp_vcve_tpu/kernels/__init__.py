from .conv_block import conv3x3_pallas, drt_block_pallas

__all__ = ["conv3x3_pallas", "drt_block_pallas"]
