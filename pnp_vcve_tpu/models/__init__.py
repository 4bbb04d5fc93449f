from .caa import BasePredictor, BiasPredictor, SEModule
from .bae import DRTBlock, ResidualBlocksWithInputConvDynamicDRT
from .pnp_vcve import PnPVCVE

__all__ = [
    "BasePredictor",
    "BiasPredictor",
    "SEModule",
    "DRTBlock",
    "ResidualBlocksWithInputConvDynamicDRT",
    "PnPVCVE",
]
