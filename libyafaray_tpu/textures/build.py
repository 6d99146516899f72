"""TexturePool builder: freeze staged texture ParamMaps into SoA tables.

Replaces the Texture factory (src/texture/texture.cc:38-46) + ImageTexture
load path (src/texture/texture_image.cc:484-575). Image textures are packed
into one flat texel pool with precomputed mip chains (box-filtered), so
trilinear/EWA sampling is two gathers + lerp instead of per-mip allocations.
"""
from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..scene_types import Background, TexturePool
from . import (MAX_MIPS, RAMP_MAX, TEX_BLEND, TEX_CLOUDS, TEX_DISTORTED_NOISE,
               TEX_IMAGE, TEX_MARBLE, TEX_MUSGRAVE, TEX_RGB_CUBE, TEX_VORONOI,
               TEX_WOOD)
from .noise import noise_type_id

_TEX_BY_NAME = {
    "image": TEX_IMAGE, "blend": TEX_BLEND, "clouds": TEX_CLOUDS,
    "marble": TEX_MARBLE, "wood": TEX_WOOD, "voronoi": TEX_VORONOI,
    "musgrave": TEX_MUSGRAVE, "distorted_noise": TEX_DISTORTED_NOISE,
    "rgb_cube": TEX_RGB_CUBE,
}

_BLEND_STYPE = {"lin": 0, "quad": 1, "ease": 2, "diag": 3, "sphere": 4,
                "halo": 5, "radial": 6}
_MARBLE_SHAPE = {"sin": 0, "saw": 1, "tri": 2}
_WOOD_TYPE = {"bands": 0, "rings": 1, "bandnoise": 2, "ringnoise": 3}
_VORONOI_CMODE = {"intensity-without-color": 0, "int": 0, "position": 1,
                  "col1": 1, "position-outline": 2, "col2": 2,
                  "position-outline-intensity": 3, "col3": 3}
_MUSGRAVE_TYPE = {"fBm": 0, "multifractal": 1, "heteroterrain": 2,
                  "hybridmf": 3, "ridgedmf": 4}
_INTERP = {"none": 0, "bilinear": 1, "bicubic": 2, "mipmap_trilinear": 3,
           "mipmap_ewa": 4}
_EXTEND = {"repeat": 0, "extend": 1, "clip": 2, "clipcube": 2, "checker": 3}


def _mip_chain(img: np.ndarray):
    """Box-filter mip pyramid down to 1x1 (power-of-two friendly; odd sizes
    floor-divide, matching the usual renderer convention)."""
    mips = [img]
    while min(img.shape[0], img.shape[1]) > 1 and len(mips) < MAX_MIPS:
        h, w = img.shape[:2]
        h2, w2 = max(h // 2, 1), max(w // 2, 1)
        img = img[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2, 4).mean((1, 3))
        mips.append(img.astype(np.float32))
    return mips


def build_pool(builder) -> TexturePool:
    names = builder.texture_order
    n = len(names)
    texels = [np.zeros((1, 4), np.float32)]
    opt_req = []   # per-image-texture image_optimization requests
    off = 1
    img_offset = np.zeros((n,), np.int32)
    img_w = np.zeros((n,), np.int32)
    img_h = np.zeros((n,), np.int32)
    mip_offsets = np.full((n, MAX_MIPS), -1, np.int32)
    num_mips = np.zeros((n,), np.int32)
    tex_type = np.zeros((n,), np.int32)
    params_f = np.zeros((n, 16), np.float32)
    params_c = np.zeros((n, 2, 4), np.float32)
    params_c[:, 0] = (0, 0, 0, 1)
    params_c[:, 1] = (1, 1, 1, 1)
    ramp_pos = np.zeros((n, RAMP_MAX), np.float32)
    ramp_col = np.zeros((n, RAMP_MAX, 4), np.float32)
    ramp_count = np.zeros((n,), np.int32)
    ramp_mode = np.zeros((n,), np.int32)
    interp = np.zeros((n,), np.int32)
    extend = np.zeros((n,), np.int32)
    adj = np.zeros((n, 8), np.float32)
    adj[:, :4] = 1.0   # mult rgb + intensity default 1
    adj[:, 4] = 1.0    # contrast
    adj[:, 5] = 1.0    # saturation
    used_noise = set()
    max_oct = 2

    for i, name in enumerate(names):
        pm = builder.textures[name]
        ty_name = pm.get_string("type", "image")
        ty = _TEX_BY_NAME.get(ty_name)
        if ty is None:
            raise KeyError(f"texture: unknown type {ty_name!r}")
        tex_type[i] = ty
        if "color1" in pm:
            params_c[i, 0] = pm.get_color("color1")
        if "color2" in pm:
            params_c[i, 1] = pm.get_color("color2")
        adj[i] = (pm.get_float("adj_mult_factor_red", 1.0),
                  pm.get_float("adj_mult_factor_green", 1.0),
                  pm.get_float("adj_mult_factor_blue", 1.0),
                  pm.get_float("adj_intensity", 1.0),
                  pm.get_float("adj_contrast", 1.0),
                  pm.get_float("adj_saturation", 1.0),
                  pm.get_float("adj_hue", 0.0),
                  1.0 if pm.get_bool("adj_clamp", False) else 0.0)
        if pm.get_bool("use_color_ramp", False):
            items = pm.get("ramp_items", [])
            cnt = min(len(items), RAMP_MAX)
            for k in range(cnt):
                it = items[k]
                ramp_pos[i, k] = float(it.get("position", k / max(cnt - 1, 1)))
                c = np.asarray(it.get("color", (0, 0, 0, 1)), np.float32)
                ramp_col[i, k, : len(c)] = c[:4]
            ramp_count[i] = cnt
            ramp_mode[i] = {"rgb": 0, "hsv": 1, "hsl": 2}.get(
                pm.get_string("ramp_color_mode", "rgb"), 0)

        nt = noise_type_id(pm.get_string("noise_type", "newperlin"))
        if ty == TEX_BLEND:
            params_f[i, 0] = _BLEND_STYPE.get(pm.get_string("stype", "lin"), 0)
            params_f[i, 1] = 1.0 if pm.get_bool("use_flip_axis", False) else 0.0
        elif ty == TEX_CLOUDS:
            params_f[i, 0] = pm.get_float("size", 4.0)
            params_f[i, 1] = pm.get_int("depth", 2)
            params_f[i, 2] = 1.0 if pm.get_bool("hard", False) else 0.0
            params_f[i, 3] = nt
            params_f[i, 4] = {"none": 0, "positive": 1, "negative": 2}.get(
                pm.get_string("bias", "none"), 0)
            used_noise.add(nt)
            max_oct = max(max_oct, pm.get_int("depth", 2) + 1)
        elif ty == TEX_MARBLE:
            params_f[i, 0] = pm.get_float("size", 4.0)
            params_f[i, 1] = pm.get_int("depth", 2)
            params_f[i, 2] = 1.0 if pm.get_bool("hard", False) else 0.0
            params_f[i, 3] = nt
            params_f[i, 4] = pm.get_float("turbulence", 5.0)
            params_f[i, 5] = pm.get_float("sharpness", 1.0)
            params_f[i, 6] = _MARBLE_SHAPE.get(pm.get_string("shape", "sin"), 0)
            used_noise.add(nt)
            max_oct = max(max_oct, pm.get_int("depth", 2) + 1)
        elif ty == TEX_WOOD:
            params_f[i, 0] = pm.get_float("size", 1.0)
            params_f[i, 1] = pm.get_int("depth", 2)
            params_f[i, 2] = 1.0 if pm.get_bool("hard", False) else 0.0
            params_f[i, 3] = nt
            params_f[i, 4] = pm.get_float("turbulence", 1.0)
            params_f[i, 5] = _WOOD_TYPE.get(pm.get_string("wood_type", "bands"), 0)
            params_f[i, 6] = _MARBLE_SHAPE.get(pm.get_string("shape", "sin"), 0)
            used_noise.add(nt)
            max_oct = max(max_oct, pm.get_int("depth", 2) + 1)
        elif ty == TEX_VORONOI:
            params_f[i, 0] = pm.get_float("size", 0.25)
            params_f[i, 1] = pm.get_float("weight1", 1.0)
            params_f[i, 2] = pm.get_float("weight2", 0.0)
            params_f[i, 3] = pm.get_float("weight3", 0.0)
            params_f[i, 4] = pm.get_float("weight4", 0.0)
            params_f[i, 5] = pm.get_float("mk_exponent", 2.5)
            params_f[i, 6] = pm.get_float("intensity", 1.0)
            params_f[i, 7] = _VORONOI_CMODE.get(
                pm.get_string("color_mode", "int"), 0)
            used_noise.add(noise_type_id("voronoi_f1"))
        elif ty == TEX_MUSGRAVE:
            params_f[i, 0] = pm.get_float("size", 1.0)
            params_f[i, 1] = pm.get_float("H", 1.0)
            params_f[i, 2] = pm.get_float("lacunarity", 2.0)
            params_f[i, 3] = min(pm.get_float("octaves", 2.0), 8.0)
            params_f[i, 4] = pm.get_float("offset", 1.0)
            params_f[i, 5] = pm.get_float("gain", 1.0)
            params_f[i, 6] = pm.get_float("intensity", 1.0)
            params_f[i, 7] = _MUSGRAVE_TYPE.get(
                pm.get_string("musgrave_type", "fBm"), 0)
            params_f[i, 8] = nt
            used_noise.add(nt)
            max_oct = max(max_oct, int(math.ceil(
                min(pm.get_float("octaves", 2.0), 8.0))) + 1)
        elif ty == TEX_DISTORTED_NOISE:
            params_f[i, 0] = pm.get_float("size", 1.0)
            params_f[i, 1] = pm.get_float("distort", 1.0)
            params_f[i, 2] = noise_type_id(pm.get_string("noise_type1",
                                                         "newperlin"))
            params_f[i, 3] = noise_type_id(pm.get_string("noise_type2",
                                                         "newperlin"))
            used_noise.add(int(params_f[i, 2]))
            used_noise.add(int(params_f[i, 3]))
        elif ty == TEX_IMAGE:
            img = builder.texture_images.get(name)
            if img is None:
                path = pm.get_string("filename", pm.get_string("image_name", ""))
                if path:
                    from .. import io as yio
                    img = yio.load_image(path)
                else:
                    img = np.ones((1, 1, 4), np.float32)
            img = np.asarray(img, np.float32)
            if img.ndim == 2:
                img = img[..., None]
            if img.shape[-1] == 1:
                img = np.repeat(img, 3, -1)
            if img.shape[-1] == 3:
                img = np.concatenate([img, np.ones_like(img[..., :1])], -1)
            gamma = pm.get_float("gamma", 1.0)
            cs = pm.get_string("color_space", "")
            if cs in ("sRGB", "srgb"):
                lin = np.clip(img[..., :3], 0, None)
                a = lin / 12.92
                b = ((lin + 0.055) / 1.055) ** 2.4
                img = np.concatenate(
                    [np.where(lin <= 0.04045, a, b), img[..., 3:]], -1)
            elif gamma != 1.0:
                img = np.concatenate(
                    [np.clip(img[..., :3], 0, None) ** gamma, img[..., 3:]], -1)
            if pm.get_bool("rot90", False):
                img = np.rot90(img, axes=(0, 1)).copy()
            opt = pm.get_string("image_optimization", "none")
            opt_req.append(opt if opt in ("none", "optimized", "compressed")
                           else "none")
            mips = _mip_chain(img.astype(np.float32))
            img_offset[i] = off
            img_h[i], img_w[i] = img.shape[:2]
            num_mips[i] = len(mips)
            for mi, m in enumerate(mips):
                mip_offsets[i, mi] = off
                texels.append(m.reshape(-1, 4))
                off += m.shape[0] * m.shape[1]
            params_f[i, 0] = pm.get_float("xrepeat", 1.0)
            params_f[i, 1] = pm.get_float("yrepeat", 1.0)
            params_f[i, 2] = pm.get_float("cropmin_x", 0.0)
            params_f[i, 3] = pm.get_float("cropmin_y", 0.0)
            params_f[i, 4] = pm.get_float("cropmax_x", 1.0)
            params_f[i, 5] = pm.get_float("cropmax_y", 1.0)
            params_f[i, 6] = 1.0 if pm.get_bool("mirror_x", False) else 0.0
            params_f[i, 7] = 1.0 if pm.get_bool("mirror_y", False) else 0.0
            params_f[i, 8] = pm.get_float("trilinear_level_bias", 0.0)
            params_f[i, 9] = pm.get_float("ewa_max_anisotropy", 8.0)
            interp[i] = _INTERP.get(pm.get_string("interpolate", "bilinear"), 1)
            extend[i] = _EXTEND.get(pm.get_string("clipping", "repeat"), 0)

    # image_optimization levels (reference image.h:47-48): pick the pool
    # dtype as the HIGHEST precision requested by any image texture
    texel_np = np.concatenate(texels, axis=0)
    texel_scale = np.ones((max(n, 1),), np.float32)
    if opt_req and all(o == "compressed" for o in opt_req):
        # u8 quantization with per-texture scale (covers HDR inputs)
        for i in range(n):
            if img_offset[i] < 0 or num_mips[i] == 0:
                continue
            end = (img_offset[i] + sum(
                max(1, img_h[i] >> l) * max(1, img_w[i] >> l)
                for l in range(num_mips[i])))
            sl = texel_np[img_offset[i]:end]
            sc = max(1.0, float(sl.max())) if sl.size else 1.0
            texel_scale[i] = sc
            texel_np[img_offset[i]:end] = np.clip(sl / sc, 0.0, 1.0)
        texel_np = np.round(texel_np * 255.0).astype(np.uint8)
    elif opt_req and all(o in ("optimized", "compressed") for o in opt_req):
        texel_np = texel_np.astype(np.float16)
    pool = TexturePool(
        texel_pool=jnp.asarray(texel_np),
        texel_scale=jnp.asarray(texel_scale),
        img_offset=jnp.asarray(img_offset), img_width=jnp.asarray(img_w),
        img_height=jnp.asarray(img_h), mip_offsets=jnp.asarray(mip_offsets),
        num_mips=jnp.asarray(num_mips), tex_type=jnp.asarray(tex_type),
        params_f=jnp.asarray(params_f), params_c=jnp.asarray(params_c),
        ramp_pos=jnp.asarray(ramp_pos), ramp_col=jnp.asarray(ramp_col),
        ramp_count=jnp.asarray(ramp_count), ramp_mode=jnp.asarray(ramp_mode),
        interp=jnp.asarray(interp), extend=jnp.asarray(extend),
        gamma_applied=jnp.ones((max(n, 1),), jnp.float32),
        adj=jnp.asarray(adj),
        num_textures=n,
        used_types=tuple(sorted(set(int(t) for t in tex_type))),
        used_noise=tuple(sorted(used_noise)) or (0,),
        max_octaves=int(max_oct),
        used_interps=tuple(sorted(set(int(i) for i in interp))),
    )
    return pool


def build_env_tables(bg: Background, pool: TexturePool,
                     tex_images: dict, tex_name: str) -> Background:
    """Alias-method importance tables over the equirect env map
    (replacing the reference's per-row Pdf1D CDF binary search,
    light_background.cc:51-69). Host-side numpy; O(HW)."""
    img = tex_images.get(tex_name)
    if img is None:
        return bg
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None].repeat(3, -1)
    h, w = img.shape[:2]
    lum = img[..., :3].mean(-1)
    # solid-angle weight per row: sin(theta)
    theta = (np.arange(h) + 0.5) / h * np.pi
    weights = lum * np.sin(theta)[:, None]
    flat = weights.reshape(-1).astype(np.float64)
    total = flat.sum()
    if total <= 0:
        return bg
    prob = flat / total  # discrete texel probabilities
    n = h * w
    # pdf in solid angle: p_discrete / texel_solid_angle
    texel_sa = (2 * np.pi / w) * (np.pi / h) * np.sin(theta)[:, None]
    pdf_sa = (prob.reshape(h, w) / np.maximum(texel_sa, 1e-12)).reshape(-1)
    # Walker alias table
    scaled = prob * n
    alias = np.arange(n, dtype=np.int64)
    accept = np.ones(n)
    small = [i for i in range(n) if scaled[i] < 1.0]
    large = [i for i in range(n) if scaled[i] >= 1.0]
    while small and large:
        s = small.pop()
        l = large.pop()
        accept[s] = scaled[s]
        alias[s] = l
        scaled[l] = scaled[l] - (1.0 - scaled[s])
        (small if scaled[l] < 1.0 else large).append(l)
    return bg.replace(
        env_alias_prob=jnp.asarray(accept, jnp.float32),
        env_alias_idx=jnp.asarray(alias, jnp.int32),
        env_pdf=jnp.asarray(pdf_sa, jnp.float32),
        env_shape=(h, w))
