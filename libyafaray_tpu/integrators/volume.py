"""Volume integrators: emission / single-scatter / sky, wavefront-wide.

Replaces src/integrator/volume/* (EmissionIntegrator integrator_emission.cc,
SingleScatterIntegrator integrator_single_scatter.cc, SkyIntegrator
integrator_sky.cc). The reference ray-marches each camera ray with a
per-ray adaptive step; here the march is a fixed-step lax-unrolled loop over
the whole wavefront (static step count, masked segment bounds) — identical
estimator, TPU-shaped control flow. Applied by the surface integrator like
the reference's applyVolumetricEffects (integrator_tiled.cc:694):
    L = transmittance(segment) * L_surface + L_volume(segment).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import lights as L
from .. import sampler
from ..math import vec
from ..scene_types import SceneData
from ..volumes import ray_aabb_span, sigma_st

Array = jax.Array

DEFAULT_STEPS = 16


def _segment(scene: SceneData, o: Array, d: Array, t_hit: Array):
    """Clip [0, t_hit] to the union volume AABB span."""
    hit, t0, t1 = ray_aabb_span(scene, o, d, t_hit)
    t0 = jnp.where(hit, t0, 0.0)
    t1 = jnp.where(hit, t1, 0.0)
    return t0, jnp.maximum(t1, t0)


def transmittance(scene: SceneData, o: Array, d: Array, t_hit: Array,
                  steps: int = DEFAULT_STEPS) -> Array:
    """exp(-tau) over the volume segment of each ray
    (DensityVolumeRegion::tau numeric integration, volume.h:57-132)."""
    if scene.volumes is None or scene.volumes.num_volumes == 0:
        return jnp.ones(o.shape, jnp.float32)
    t0, t1 = _segment(scene, o, d, t_hit)
    dt = (t1 - t0) / steps
    tau = jnp.zeros_like(o)
    for s in range(steps):
        tm = t0 + (s + 0.5) * dt
        p = o + d * tm[..., None]
        _, st, _ = sigma_st(scene, p)
        tau = tau + st * dt[..., None]
    return jnp.exp(-tau)


def _hg_phase(cos_t: Array, g: Array) -> Array:
    """Henyey-Greenstein phase function."""
    g2 = g * g
    denom = jnp.power(jnp.maximum(1.0 + g2 - 2.0 * g * cos_t, 1e-6), 1.5)
    return (1.0 - g2) / (4.0 * jnp.pi * denom)


def in_scatter(scene: SceneData, o: Array, d: Array, t_hit: Array,
               pixel_id: Array, sample_idx: Array,
               steps: int = DEFAULT_STEPS,
               transparent_shadows: int = 0) -> Array:
    """Single-scattering + emission estimate along the segment
    (SingleScatterIntegrator::integrate, integrator_single_scatter.cc).
    One light sample per march step (uniform light pick), shadowed through
    scene geometry."""
    if scene.volumes is None or scene.volumes.num_volumes == 0:
        return jnp.zeros(o.shape, jnp.float32)
    from . import common
    num_lights = scene.lights.num_lights
    t0, t1 = _segment(scene, o, d, t_hit)
    dt = (t1 - t0) / steps
    acc = jnp.zeros_like(o)
    tau = jnp.zeros_like(o)
    n = o.shape[0]
    g_mean = (scene.volumes.g.mean() if scene.volumes.num_volumes > 0
              else jnp.float32(0.0))
    for s in range(steps):
        tm = t0 + (s + 0.5) * dt
        p = o + d * tm[..., None]
        ss, st, em = sigma_st(scene, p)
        tr = jnp.exp(-tau)
        # emission (EmissionIntegrator::integrate)
        acc = acc + tr * em * dt[..., None]
        if num_lights > 0:
            ul, u1, u2, _ = jnp.moveaxis(
                sampler.rand4(pixel_id, sample_idx, 40 + s, 5), -1, 0)
            li = jnp.clip((ul * num_lights).astype(jnp.int32), 0,
                          num_lights - 1)
            ls = L.sample_light(scene, li, p,
                                jnp.zeros_like(p).at[..., 2].set(1.0), u1, u2)
            # shadow from the march point
            shadow_o = p
            prim = jnp.full((n,), -1, jnp.int32)
            vis = common.trace_shadow(scene, shadow_o, prim, ls.wi, ls.dist,
                                      transparent_shadows)
            phase = _hg_phase(vec.dot(d, ls.wi), g_mean)
            contrib = (ss * ls.radiance * vis
                       * (phase / jnp.maximum(ls.pdf, 1e-9)
                          * num_lights)[..., None])
            acc = acc + tr * jnp.where(ls.valid[..., None], contrib, 0.0) \
                * dt[..., None]
        tau = tau + st * dt[..., None]
    return acc


def apply_volumetric(scene: SceneData, cfg, radiance: Array, o: Array,
                     d: Array, t_hit: Array, pixel_id: Array,
                     sample_idx: Array) -> Array:
    """applyVolumetricEffects analogue for the camera segment."""
    if scene.volumes is None or scene.volumes.num_volumes == 0:
        return radiance
    kind = getattr(cfg, "vol_kind", "single_scatter")
    steps = getattr(cfg, "vol_steps", DEFAULT_STEPS)
    tr = transmittance(scene, o, d, t_hit, steps)
    if kind == "emission":
        em = jnp.zeros_like(radiance)
        t0, t1 = _segment(scene, o, d, t_hit)
        dt = (t1 - t0) / steps
        tau = jnp.zeros_like(radiance)
        for s in range(steps):
            tm = t0 + (s + 0.5) * dt
            p = o + d * tm[..., None]
            _, st, e = sigma_st(scene, p)
            em = em + jnp.exp(-tau) * e * dt[..., None]
            tau = tau + st * dt[..., None]
        vol = em
    else:
        vol = in_scatter(scene, o, d, t_hit, pixel_id, sample_idx, steps,
                         getattr(cfg, "transparent_shadows", 0))
    return tr * radiance + vol
