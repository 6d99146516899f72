"""Math foundations: batched vector/matrix/AABB ops (replaces src/math + src/geometry scalar classes)."""
from . import bound, mat4, vec

__all__ = ["vec", "mat4", "bound"]
