"""Microfacet distributions: Blinn, Ashikhmin-Shirley anisotropic, GGX.

Replaces include/material/material_utils_microfacet.h:25-207 (blinnD,
asAnisoD/asAnisoSample, ggxD/ggxG/ggxSample/ggxPdf, Schlick fresnel) with
batched branchless versions. All directions are in the local shading frame
(z = shading normal); callers convert with the SurfacePoint nu/nv/n frame.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

INV_PI = 1.0 / jnp.pi


def blinn_d(cos_h: Array, exponent: Array) -> Array:
    # eps-clamp: d/d(exponent) pow(c,e) = pow*ln(c); ln(0) would poison
    # the exponent gradient through masked lanes
    cos_h = jnp.maximum(cos_h, 1e-12)
    return (exponent + 2.0) * (0.5 * INV_PI) * jnp.power(cos_h, exponent)


def blinn_sample_h(u1: Array, u2: Array, exponent: Array) -> Array:
    """Sample half-vector from the Blinn lobe; pdf_h = blinn_d * cos_h /
    ... (standard: pdf_h = (e+1)/(2pi) cos^e)."""
    cos_t = jnp.power(jnp.maximum(u1, 1e-12), 1.0 / (exponent + 1.0))
    sin_t = jnp.sqrt(jnp.maximum(1e-12, 1.0 - cos_t * cos_t))
    phi = 2.0 * jnp.pi * u2
    return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)


def blinn_pdf_h(cos_h: Array, exponent: Array) -> Array:
    return (exponent + 1.0) * (0.5 * INV_PI) * jnp.power(jnp.maximum(cos_h, 1e-12), exponent)


def as_aniso_d(h: Array, exp_u: Array, exp_v: Array) -> Array:
    """Ashikhmin-Shirley anisotropic distribution (asAnisoD)."""
    cos_h = jnp.maximum(h[..., 2], 1e-12)
    sin2 = jnp.maximum(1.0 - cos_h * cos_h, 1e-12)
    e = (exp_u * h[..., 0] * h[..., 0] + exp_v * h[..., 1] * h[..., 1]) / sin2
    norm = jnp.sqrt((exp_u + 2.0) * (exp_v + 2.0)) * (0.5 * INV_PI)
    return norm * jnp.power(cos_h, e)


def as_aniso_sample_h(u1: Array, u2: Array, exp_u: Array, exp_v: Array) -> Array:
    """Sample AS anisotropic half-vector (asAnisoSample), handled per-quadrant
    branchlessly via phi remapping."""
    phi = 2.0 * jnp.pi * u2
    t = jnp.arctan(jnp.sqrt((exp_u + 1.0) / (exp_v + 1.0)) * jnp.tan(phi))
    # arctan/tan quadrant fix: keep phi's quadrant
    quad = jnp.floor((phi + 0.5 * jnp.pi) / jnp.pi)
    phi_h = t + quad * jnp.pi
    cp, sp_ = jnp.cos(phi_h), jnp.sin(phi_h)
    e = exp_u * cp * cp + exp_v * sp_ * sp_
    cos_t = jnp.power(jnp.maximum(u1, 1e-12), 1.0 / (e + 1.0))
    sin_t = jnp.sqrt(jnp.maximum(1e-12, 1.0 - cos_t * cos_t))
    return jnp.stack([sin_t * cp, sin_t * sp_, cos_t], axis=-1)


def as_aniso_pdf_h(h: Array, exp_u: Array, exp_v: Array) -> Array:
    cos_h = jnp.maximum(h[..., 2], 1e-12)
    sin2 = jnp.maximum(1.0 - cos_h * cos_h, 1e-12)
    e = (exp_u * h[..., 0] * h[..., 0] + exp_v * h[..., 1] * h[..., 1]) / sin2
    norm = jnp.sqrt((exp_u + 1.0) * (exp_v + 1.0)) * (0.5 * INV_PI)
    return norm * jnp.power(cos_h, e)


# --- GGX (used by rough_glass; material_utils_microfacet.h:108-173) ---

def ggx_d(cos_h: Array, alpha2: Array) -> Array:
    cos_h = jnp.maximum(cos_h, 0.0)
    c2 = cos_h * cos_h
    denom = c2 * (alpha2 - 1.0) + 1.0
    return alpha2 * INV_PI / jnp.maximum(denom * denom, 1e-12)


def ggx_sample_h(u1: Array, u2: Array, alpha: Array) -> Array:
    phi = 2.0 * jnp.pi * u2
    tan2 = alpha * alpha * u1 / jnp.maximum(1.0 - u1, 1e-9)
    cos_t = jax.lax.rsqrt(1.0 + tan2)
    sin_t = jnp.sqrt(jnp.maximum(1e-12, 1.0 - cos_t * cos_t))
    return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)


def ggx_smith_g1(cos_v: Array, alpha2: Array) -> Array:
    cos_v = jnp.abs(cos_v)
    c2 = cos_v * cos_v
    return 2.0 * cos_v / jnp.maximum(
        cos_v + jnp.sqrt(alpha2 + (1.0 - alpha2) * c2), 1e-12)


def ggx_g(cos_i: Array, cos_o: Array, alpha2: Array) -> Array:
    return ggx_smith_g1(cos_i, alpha2) * ggx_smith_g1(cos_o, alpha2)


def ggx_pdf_h(cos_h: Array, alpha2: Array) -> Array:
    return ggx_d(cos_h, alpha2) * jnp.maximum(cos_h, 0.0)
