"""Textures: image texel pool + procedural noise textures.

Replaces src/texture/* (factory texture.cc:38-46: blend/clouds/marble/wood/
voronoi/musgrave/distorted_noise/rgb_cube/image) — see textures/procedural.py
and textures/image.py for the evaluators. This module hosts the pool builder
and environment-map sampling used by texture backgrounds / bglight.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..math import vec
from ..scene_types import Background, SceneData, TexturePool

Array = jax.Array

# texture type enum (reference factory strings)
TEX_IMAGE = 0
TEX_BLEND = 1
TEX_CLOUDS = 2
TEX_MARBLE = 3
TEX_WOOD = 4
TEX_VORONOI = 5
TEX_MUSGRAVE = 6
TEX_DISTORTED_NOISE = 7
TEX_RGB_CUBE = 8

MAX_MIPS = 12
RAMP_MAX = 8


def build_texture_pool(builder) -> Optional[TexturePool]:
    """Freeze the builder's staged textures into a TexturePool (delegates to
    textures/build.py; returns None when the scene has no textures)."""
    if not builder.texture_order:
        return None
    from .build import build_pool
    return build_pool(builder)


def sample_texture(scene: SceneData, tex_id: Array, p: Array, uv: Array,
                   duv_dx: Array = None, duv_dy: Array = None) -> Array:
    """Evaluate texture per lane (dynamic id): rgba. Dispatches into the
    masked procedural evaluators + image pool gather. Optional uv-space
    screen derivatives drive mipmap/EWA filtering."""
    from .eval import eval_textures
    return eval_textures(scene, tex_id, p, uv, duv_dx=duv_dx, duv_dy=duv_dy)


def _dir_to_equirect_uv(d: Array, rotation: Array) -> Array:
    u = (jnp.arctan2(d[..., 1], d[..., 0]) + rotation) / (2 * jnp.pi) + 0.5
    v = 1.0 - jnp.arccos(jnp.clip(d[..., 2], -1.0, 1.0)) / jnp.pi
    return jnp.stack([u % 1.0, v], axis=-1)


def _dir_to_angular_uv(d: Array, rotation: Array) -> Array:
    # angular (light-probe) mapping, reference texture background
    r = jnp.arccos(jnp.clip(-d[..., 2], -1.0, 1.0)) / jnp.pi
    den = jnp.sqrt(jnp.maximum(d[..., 0] ** 2 + d[..., 1] ** 2, 1e-12))
    u = 0.5 + 0.5 * r * d[..., 0] / den
    v = 0.5 + 0.5 * r * d[..., 1] / den
    return jnp.stack([u, v], axis=-1)


def sample_env(scene: SceneData, d: Array, bg: Background) -> Array:
    """Environment lookup for texture backgrounds (background_texture.cc)."""
    if bg.mapping == "angular":
        uv = _dir_to_angular_uv(d, bg.rotation)
    else:
        uv = _dir_to_equirect_uv(d, bg.rotation)
    tex_id = jnp.full(d.shape[:-1], bg.tex_id, jnp.int32)
    return sample_texture(scene, tex_id, d, uv)[..., :3]


def env_alias_sample(scene: SceneData, u1: Array, u2: Array):
    """Alias-table importance sample of the env map -> (dir, pdf_sa).

    The alias method replaces the reference's per-row CDF binary search
    (light_background.cc:51-69 + sample_pdf1d.h) — O(1) per draw and
    branch-free, which fits the VPU."""
    bg = scene.background
    h, w = bg.env_shape
    n_texel = h * w
    idx = jnp.clip((u1 * n_texel).astype(jnp.int32), 0, n_texel - 1)
    frac = u1 * n_texel - idx.astype(jnp.float32)
    take_alias = frac > bg.env_alias_prob[idx]
    texel = jnp.where(take_alias, bg.env_alias_idx[idx], idx)
    ty = texel // w
    tx = texel % w
    # jitter inside the texel; u2 drives both via low-bits decorrelation
    ju = (u2 * 7919.0) % 1.0
    jv = (u2 * 104729.0) % 1.0
    uu = (tx.astype(jnp.float32) + ju) / w
    vv = (ty.astype(jnp.float32) + jv) / h
    phi = (uu - 0.5) * 2.0 * jnp.pi - bg.rotation
    theta = (1.0 - vv) * jnp.pi
    st = jnp.sin(theta)
    d = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), jnp.cos(theta)], axis=-1)
    pdf = bg.env_pdf[texel]
    return d, jnp.maximum(pdf, 1e-12)


def env_pdf_dir(scene: SceneData, d: Array) -> Array:
    """pdf of env_alias_sample producing direction d (for MIS)."""
    bg = scene.background
    h, w = bg.env_shape
    uv = _dir_to_equirect_uv(d, bg.rotation)
    tx = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    ty = jnp.clip(((1.0 - uv[..., 1]) * h).astype(jnp.int32), 0, h - 1)
    return bg.env_pdf[ty * w + tx]
