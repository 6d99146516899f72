"""Procedural texture evaluators (masked, wavefront-wide).

Replaces src/texture/texture_basic.cc (blend/clouds/marble/wood/voronoi/
musgrave/distorted_noise/rgb_cube). Formulas follow the reference's
Blender-compatible definitions; the noise bases come from textures/noise.py.
Every evaluator computes for ALL lanes and is masked by the dispatcher —
the per-type math is cheap VPU work, and only types present in the pool are
traced (TexturePool.used_types).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..scene_types import SceneData, TexturePool
from . import (TEX_BLEND, TEX_CLOUDS, TEX_DISTORTED_NOISE, TEX_MARBLE,
               TEX_MUSGRAVE, TEX_RGB_CUBE, TEX_VORONOI, TEX_WOOD)
from .noise import (basis_noise, perlin, turbulence, voronoi_f, _hash_unit,
                    static_basis_noise)

Array = jax.Array


def _masked_turbulence(p: Array, depth: Array, size: Array, hard: Array,
                       ntype: Array, max_oct: int, used_noise) -> Array:
    """Turbulence with per-lane dynamic octave count / noise basis,
    statically bounded by max_oct and the set of used bases."""
    # reference semantics: `size` MULTIPLIES the coordinate (frequency,
    # not period) — NoiseGenerator::turbulence tp = pt * size
    # (noise_generator.cc); found by the r5 reference-render parity probe
    # (our old 1/size gave a 16x frequency mismatch at size=4)
    freq = size
    amp = jnp.ones_like(size)
    total = jnp.zeros(p.shape[:-1], jnp.float32)
    norm = jnp.zeros_like(total)
    for o in range(max_oct):
        n = _basis_masked(ntype, p * freq[..., None], o, used_noise)
        n2 = n * 2.0 - 1.0
        n = jnp.where(hard > 0, jnp.abs(n2), 0.5 + 0.5 * n2)
        w = (o <= depth).astype(jnp.float32)
        total = total + amp * n * w
        norm = norm + amp * w
        amp = amp * 0.5
        freq = freq * 2.0
    return total / jnp.maximum(norm, 1e-9)


def _basis_masked(ntype: Array, p: Array, seed: int, used_noise) -> Array:
    """Noise basis with per-lane dynamic type, tracing only used bases."""
    if len(used_noise) == 1:
        return static_basis_noise(used_noise[0], p, seed)
    out = jnp.zeros(p.shape[:-1], jnp.float32)
    for k in used_noise:
        out = jnp.where(ntype == k, static_basis_noise(k, p, seed), out)
    return out


def _waveform(x: Array, shape: Array) -> Array:
    """sin/saw/tri band shaping (reference texture_basic.cc marble/wood)."""
    s_sin = 0.5 + 0.5 * jnp.sin(x)
    fx = (x / (2 * jnp.pi)) % 1.0
    s_saw = fx
    s_tri = 1.0 - 2.0 * jnp.abs(fx - 0.5)
    return jnp.where(shape == 1, s_saw, jnp.where(shape == 2, s_tri, s_sin))


def eval_procedural(pool: TexturePool, tex_id: Array, p: Array,
                    used_types, used_noise, max_oct: int):
    """Returns (color[N,4], intensity[N]) for procedural types; image lanes
    get zeros (the image sampler overrides them)."""
    pf = pool.params_f[tex_id]
    ty = pool.tex_type[tex_id]
    c1 = pool.params_c[tex_id, 0]
    c2 = pool.params_c[tex_id, 1]
    inten = jnp.zeros(p.shape[:-1], jnp.float32)

    x, y, z = p[..., 0], p[..., 1], p[..., 2]

    if TEX_BLEND in used_types:
        # texture_basic.cc BlendTexture: progression over x (y when flipped)
        stype = pf[..., 0]
        flip = pf[..., 1] > 0
        bx = jnp.where(flip, y, x)
        by = jnp.where(flip, x, y)
        lin = (1.0 + bx) * 0.5
        v = lin
        v = jnp.where(stype == 1, lin * lin, v)
        ease = jnp.where(lin <= 0, 0.0, jnp.where(
            lin >= 1, 1.0, 3.0 * lin ** 2 - 2.0 * lin ** 3))
        v = jnp.where(stype == 2, ease, v)
        v = jnp.where(stype == 3, (2.0 + bx + by) * 0.25, v)
        r = jnp.sqrt(bx * bx + by * by + z * z)
        sph = jnp.maximum(1.0 - r, 0.0)
        v = jnp.where(stype == 4, sph, v)
        v = jnp.where(stype == 5, sph * sph, v)
        rad = (jnp.arctan2(by, bx) / (2 * jnp.pi) + 0.5)
        v = jnp.where(stype == 6, rad, v)
        inten = jnp.where(ty == TEX_BLEND, v, inten)

    if TEX_CLOUDS in used_types:
        v = _masked_turbulence(p, pf[..., 1], pf[..., 0], pf[..., 2],
                               pf[..., 3].astype(jnp.int32), max_oct,
                               used_noise)
        bias = pf[..., 4]
        v = jnp.where(bias == 2, 1.0 - v, v)
        inten = jnp.where(ty == TEX_CLOUDS, v, inten)

    if TEX_MARBLE in used_types:
        turb = _masked_turbulence(p, pf[..., 1], pf[..., 0], pf[..., 2],
                                  pf[..., 3].astype(jnp.int32), max_oct,
                                  used_noise)
        band = (x + y + z) * 5.0 + pf[..., 4] * turb
        v = _waveform(band, pf[..., 6])
        v = jnp.power(jnp.maximum(v, 1e-6), pf[..., 5])
        inten = jnp.where(ty == TEX_MARBLE, v, inten)

    if TEX_WOOD in used_types:
        turb = _masked_turbulence(p, pf[..., 1], pf[..., 0], pf[..., 2],
                                  pf[..., 3].astype(jnp.int32), max_oct,
                                  used_noise)
        wt = pf[..., 5]
        rings = jnp.sqrt(x * x + y * y + z * z) * 20.0
        bands = (x + y + z) * 10.0
        base = jnp.where((wt == 1) | (wt == 3), rings, bands)
        wob = jnp.where(wt >= 2, pf[..., 4] * turb, 0.0)
        v = _waveform(base + wob, pf[..., 6])
        inten = jnp.where(ty == TEX_WOOD, v, inten)

    if TEX_VORONOI in used_types:
        size = jnp.maximum(pf[..., 0], 1e-9)
        f1, f2, f3, f4 = voronoi_f(p * size[..., None])
        sc = (pf[..., 1] * f1 + pf[..., 2] * f2 + pf[..., 3] * f3
              + pf[..., 4] * f4) * pf[..., 6]
        inten = jnp.where(ty == TEX_VORONOI, jnp.clip(sc, 0.0, 1.0), inten)

    if TEX_MUSGRAVE in used_types:
        size = jnp.maximum(pf[..., 0], 1e-9)
        H = pf[..., 1]
        lac = jnp.maximum(pf[..., 2], 1e-6)
        octs = pf[..., 3]
        offs = pf[..., 4]
        gain = pf[..., 5]
        mty = pf[..., 7]
        ntype = pf[..., 8].astype(jnp.int32)
        pp = p * size[..., None]
        value = jnp.zeros_like(inten)
        # fBm / multifractal accumulators with dynamic octave masking
        fbm = jnp.zeros_like(inten)
        mult = jnp.ones_like(inten)
        ridge_w = jnp.ones_like(inten)
        ridge = jnp.zeros_like(inten)
        freq = jnp.ones_like(inten)
        for o in range(max_oct):
            w = jnp.clip(octs - o, 0.0, 1.0)  # fractional last octave
            n = _basis_masked(ntype, pp * freq[..., None], o, used_noise) * 2.0 - 1.0
            pw = jnp.power(freq, -H)
            fbm = fbm + w * n * pw
            mult = mult * jnp.where(w > 0, 1.0 + w * n * pw, 1.0)
            r = (offs - jnp.abs(n)) ** 2 * ridge_w
            ridge = ridge + w * r * pw
            ridge_w = jnp.clip(r * gain, 0.0, 1.0)
            freq = freq * lac
        value = fbm
        value = jnp.where(mty == 1, mult - 1.0, value)
        value = jnp.where(mty == 2, fbm + offs, value)
        value = jnp.where(mty == 3, fbm + offs, value)
        value = jnp.where(mty == 4, ridge, value)
        v = value * pf[..., 6]
        inten = jnp.where(ty == TEX_MUSGRAVE,
                          jnp.clip(0.5 + 0.5 * v, 0.0, 1.0), inten)

    if TEX_DISTORTED_NOISE in used_types:
        size = jnp.maximum(pf[..., 0], 1e-9)
        pp = p * size[..., None]
        n1 = pf[..., 2].astype(jnp.int32)
        n2 = pf[..., 3].astype(jnp.int32)
        ox = _basis_masked(n1, pp, 11, used_noise) * 2.0 - 1.0
        oy = _basis_masked(n1, pp, 12, used_noise) * 2.0 - 1.0
        oz = _basis_masked(n1, pp, 13, used_noise) * 2.0 - 1.0
        dist = pf[..., 1][..., None]
        pd = pp + dist * jnp.stack([ox, oy, oz], -1)
        v = _basis_masked(n2, pd, 17, used_noise)
        inten = jnp.where(ty == TEX_DISTORTED_NOISE, v, inten)

    col = c1 + (c2 - c1) * inten[..., None]

    if TEX_RGB_CUBE in used_types:
        rgbc = jnp.concatenate([jnp.abs(p) % 1.0,
                                jnp.ones_like(p[..., :1])], -1)
        col = jnp.where((ty == TEX_RGB_CUBE)[..., None], rgbc, col)
        inten = jnp.where(ty == TEX_RGB_CUBE, rgbc[..., :3].mean(-1), inten)

    return col, inten
