"""Pallas TPU kernel: fused Möller-Trumbore closest-hit over ray tiles.

The jnp brute-force intersect (ops/intersect.py `_brute_closest`, the
AcceleratorSimpleTest analogue — src/accelerator/accelerator_simple_test.cc)
is HBM-bound: XLA materializes the [N_rays, C, 3] cross-product
intermediates, so a 518k-ray x 128-tri query moves gigabytes. This kernel
keeps the whole [TRI_CHUNK, RAY_TILE] working set in VMEM and streams only
rays in / hit records out (~24 B/ray each way), making the query
VPU-compute-bound as it should be.

Layout (all component-major so tiles are (8,128)-aligned f32):
  rays  f32[16, N]: rows 0-2 origin, 3-5 direction, 6 t_min, 7 t_max,
                    8 exclude-prim-id (as f32; exact for ids < 2^24),
                    9 shutter time (motion blur lerp), rest padding.
  tris  f32[C, 16]: cols 0-8 v0|v1|v2, col 9 camera-vis, col 10 shadow-vis
                    (0/1 floats), col 11 prim id as f32,
                    cols 12.. unused. C padded to TRI_CHUNK with vis=0.
  tris_t1 (optional) f32[C, 16]: cols 0-8 = t=1 keyframe vertices for
                    2-keyframe motion blur (BsTrianglePrimitive analogue,
                    src/geometry/primitive/primitive_triangle_bspline.cc).
  out   f32[8, N]: rows 0 best_t (t_max if miss), 1 best prim id (-1 miss),
                   2-3 barycentric u,v.

Grid: one program per RAY_TILE of rays; inner fori_loop over TRI_CHUNK
slabs of the (VMEM-resident) triangle table. Intended for scenes whose
triangle table fits VMEM (~<= 8k tris); larger scenes go through the block
accelerator (accel/blocks.py), whose inner loop reuses this math per block.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_TILE = 512      # rays per grid step (lanes: 4 x 128)
TRI_CHUNK = 128     # triangles per inner-loop slab (sublanes: 16 x 8)

EPS_DET = 1e-10


def _mt_kernel(rays_ref, tris_ref, out_ref, *, n_chunks: int,
               vis_col: int, motion: bool, tris_t1_ref=None):
    """One ray tile vs the whole triangle table."""
    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]
    t_min = rays_ref[6:7, :]
    t_max = rays_ref[7:8, :]
    excl = rays_ref[8:9, :]
    if motion:
        tt = rays_ref[9:10, :]

    def chunk(i, carry):
        best_t, best_id, best_u, best_v = carry
        base = i * TRI_CHUNK
        tr = tris_ref[pl.ds(base, TRI_CHUNK), :]

        def col(j):
            c = tr[:, j:j + 1]                       # [C,1]
            if motion:
                c1 = tris_t1_ref[pl.ds(base, TRI_CHUNK), j:j + 1]
                return c * (1.0 - tt) + c1 * tt      # [C,N] per-ray lerp
            return c
        ax, ay, az = col(0), col(1), col(2)
        bx, by, bz = col(3), col(4), col(5)
        cx, cy, cz = col(6), col(7), col(8)
        vis = tr[:, vis_col:vis_col + 1]
        pid = tr[:, 11:12]

        e1x, e1y, e1z = bx - ax, by - ay, bz - az
        e2x, e2y, e2z = cx - ax, cy - ay, cz - az
        # pvec = d x e2   ([C, N] each component)
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        ok = jnp.abs(det) > EPS_DET
        inv_det = jnp.where(ok, 1.0, 0.0) / jnp.where(ok, det, 1.0)
        # tvec = o - v0
        tvx, tvy, tvz = ox - ax, oy - ay, oz - az
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        # qvec = tvec x e1
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        hit = (ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
               & (t > t_min) & (t <= best_t)
               & (vis > 0.5) & (pid != excl))
        t = jnp.where(hit, t, jnp.inf)
        # row-reduce over the triangle axis
        tc = jnp.min(t, axis=0, keepdims=True)            # [1, N]
        win = t <= tc                                      # ties: any winner
        better = tc < best_t
        pick = win & better
        best_id = jnp.where(better, jnp.max(jnp.where(pick, pid, -1.0),
                                            axis=0, keepdims=True), best_id)
        best_u = jnp.where(better, jnp.max(jnp.where(pick, u, -jnp.inf),
                                           axis=0, keepdims=True), best_u)
        best_v = jnp.where(better, jnp.max(jnp.where(pick, v, -jnp.inf),
                                           axis=0, keepdims=True), best_v)
        best_t = jnp.where(better, tc, best_t)
        return best_t, best_id, best_u, best_v

    init = (t_max, jnp.full_like(t_max, -1.0), jnp.zeros_like(t_max),
            jnp.zeros_like(t_max))
    best_t, best_id, best_u, best_v = jax.lax.fori_loop(
        0, n_chunks, chunk, init)
    out_ref[0:1, :] = best_t
    out_ref[1:2, :] = best_id
    out_ref[2:3, :] = best_u
    out_ref[3:4, :] = best_v
    out_ref[4:8, :] = jnp.zeros((4, best_t.shape[1]), jnp.float32)


def pack_tris(v0, v1, v2, face_vis, *, pad_to: int = TRI_CHUNK):
    """Build the f32[Cpad, 16] triangle table (done once at scene compile)."""
    f = v0.shape[0]
    c = max(TRI_CHUNK, -(-f // pad_to) * pad_to)
    tab = jnp.zeros((c, 16), jnp.float32)
    tab = tab.at[:f, 0:3].set(v0)
    tab = tab.at[:f, 3:6].set(v1)
    tab = tab.at[:f, 6:9].set(v2)
    tab = tab.at[:f, 9].set(((face_vis & 1) != 0).astype(jnp.float32))
    tab = tab.at[:f, 10].set(((face_vis & 2) != 0).astype(jnp.float32))
    tab = tab.at[:f, 11].set(jnp.arange(f, dtype=jnp.float32))
    tab = tab.at[f:, 11].set(-2.0)
    return tab


@functools.partial(jax.jit, static_argnames=("shadow", "interpret"))
def mt_closest(tris, o, d, t_min, t_max, exclude, time=None,
               tris_t1=None, shadow: bool = False, interpret: bool = False):
    """Closest-hit of rays against a packed triangle table.

    Args: tris f32[C,16] (pack_tris); o,d f32[N,3]; t_min/t_max/exclude [N];
    optional time f32[N] + tris_t1 for 2-keyframe motion blur.
    Returns (t f32[N], prim i32[N] (-1 = miss), u, v).
    """
    n = o.shape[0]
    c = tris.shape[0]
    npad = -(-n // RAY_TILE) * RAY_TILE
    rays = jnp.zeros((16, npad), jnp.float32)
    rays = rays.at[0:3, :n].set(o.T)
    rays = rays.at[3:6, :n].set(d.T)
    rays = rays.at[6, :n].set(t_min)
    rays = rays.at[7, :n].set(t_max)
    rays = rays.at[7, n:].set(-1.0)          # padded rays: empty range
    rays = rays.at[8, :n].set(exclude.astype(jnp.float32))
    motion = time is not None and tris_t1 is not None
    if motion:
        rays = rays.at[9, :n].set(time)

    kernel = functools.partial(
        _mt_kernel, n_chunks=c // TRI_CHUNK,
        vis_col=10 if shadow else 9, motion=motion)
    if motion:
        body = lambda r, t0, t1, out: kernel(r, t0, out, tris_t1_ref=t1)
        in_specs = [
            pl.BlockSpec((16, RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 16), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 16), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        args = (rays, tris, tris_t1)
    else:
        body = lambda r, t0, out: kernel(r, t0, out)
        in_specs = [
            pl.BlockSpec((16, RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 16), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        args = (rays, tris)
    out = pl.pallas_call(
        body,
        grid=(npad // RAY_TILE,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, RAY_TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, npad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=45 * npad * c, bytes_accessed=(16 + 8) * 4 * npad,
            transcendentals=0),
        interpret=interpret,
    )(*args)
    best_t = out[0, :n]
    prim = out[1, :n].astype(jnp.int32)
    return best_t, prim, out[2, :n], out[3, :n]


def use_pallas() -> bool:
    import jax
    return jax.default_backend() == "tpu"
