"""Materials: vectorized differentiable BSDF table (replaces src/material)."""
from . import bsdf, microfacet

__all__ = ["bsdf", "microfacet"]
