from .stdf import STDFNet
from .mfqev2 import MFQEv2

__all__ = ["STDFNet", "MFQEv2"]
