from .platform import apply_platform_override

__all__ = ["apply_platform_override"]
