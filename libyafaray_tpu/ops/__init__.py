"""Core wavefront ops: intersection + surface-point construction."""
from . import intersect, surface

__all__ = ["intersect", "surface"]
