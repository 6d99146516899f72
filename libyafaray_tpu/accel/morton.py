"""Morton (Z-order) codes for LBVH construction — 30-bit 3D interleave."""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _expand_bits(v: Array) -> Array:
    """Spread the low 10 bits of v so there are 2 zero bits between each."""
    v = v.astype(jnp.uint32) & jnp.uint32(0x3FF)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(rel: Array) -> Array:
    """rel: [...,3] coords in [0,1] -> 30-bit morton code (uint32)."""
    q = jnp.clip(rel * 1024.0, 0.0, 1023.0).astype(jnp.uint32)
    return (_expand_bits(q[..., 0]) << 2) | (_expand_bits(q[..., 1]) << 1) \
        | _expand_bits(q[..., 2])
