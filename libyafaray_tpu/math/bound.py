"""Axis-aligned bounding boxes as (min, max) array pairs, batched.

Replaces reference `Bound` (include/geometry/bound.h, src/geometry/bound.cc)
with vectorized slab tests suitable for wavefront BVH traversal.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def union(amin: Array, amax: Array, bmin: Array, bmax: Array):
    return jnp.minimum(amin, bmin), jnp.maximum(amax, bmax)


def volume(bmin: Array, bmax: Array) -> Array:
    d = jnp.maximum(bmax - bmin, 0.0)
    return d[..., 0] * d[..., 1] * d[..., 2]


def surface_area(bmin: Array, bmax: Array) -> Array:
    d = jnp.maximum(bmax - bmin, 0.0)
    return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0])


def ray_slab(bmin: Array, bmax: Array, origin: Array, inv_dir: Array,
             t_min: Array, t_max: Array):
    """Branchless slab test (reference `Bound::cross`, bound.h).

    All args broadcast over leading dims; returns (hit_mask, t_near, t_far).
    `inv_dir` is 1/dir with +-inf allowed (IEEE semantics handle axis-parallel
    rays as long as origin is not exactly on a slab boundary; we guard NaNs).
    """
    t0 = (bmin - origin) * inv_dir
    t1 = (bmax - origin) * inv_dir
    # min/max propagate NaN -> replace with +-inf so degenerate axes are ignored
    tsmall = jnp.minimum(t0, t1)
    tbig = jnp.maximum(t0, t1)
    tsmall = jnp.where(jnp.isnan(tsmall), -jnp.inf, tsmall)
    tbig = jnp.where(jnp.isnan(tbig), jnp.inf, tbig)
    t_near = jnp.maximum(jnp.max(tsmall, axis=-1), t_min)
    t_far = jnp.minimum(jnp.min(tbig, axis=-1), t_max)
    return t_near <= t_far, t_near, t_far
