"""Tile-wavefront Pallas traversal over morton blocks.

The large-scene production hot loop — the TPU replacement for the
reference kd-tree's per-ray recursive descent
(src/accelerator/accelerator_kdtree.cc:639-721). The jnp block loop in
accel/blocks.py is HBM-gather-bound: every step gathers a DIFFERENT
[B, 9] block per ray (4096 rays x 4.6 KB = 18 MB of HBM traffic per
step). This kernel instead exploits ray coherence:

  1. rays are sorted by (direction octant, origin morton) and cut into
     tiles of RAY_TILE rays (done in jnp, accel/blocks.py query path);
  2. per tile, a conservative INTERVAL slab test (origin box x
     inv-direction interval) against all C block AABBs yields a
     front-to-back candidate block list — [T, C] work, tiny;
  3. the Pallas kernel walks each tile's candidates with double-buffered
     HBM->VMEM DMA of the block's component-major (16, B) triangle slab
     — ONE ~8 KB contiguous, (16,128)-tile-aligned fetch serves all
     RAY_TILE rays — and runs a dense [RAY_TILE, 128] Möller-Trumbore
     batch per 128-triangle sub-chunk, terminating when the next
     candidate's conservative entry distance exceeds every live ray's
     best hit.

Orientation: RAYS live on sublanes, TRIANGLES on lanes (the transpose of
accel/pallas_intersect.py) — this makes the block DMA slab a dense
(16, 128) tile with zero lane padding.

HBM traffic per tile-step: 8 KB (vs 18 MB for the jnp loop at equal ray
count) — the kernel is VPU-compute-bound as traversal should be.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

# rays per tile (one grid step). Smaller tiles tighten the per-tile
# candidate union (incoherent secondary wavefronts) at the cost of more
# grid steps; 128 measured best on v5e for the mixed primary/bounce load
# (sweep in PARITY.md par.2.5). Env override for experiments.
RAY_TILE = int(_os.environ.get("YAF_RAY_TILE", "128"))
SUB = 128          # triangles per dense MT batch inside a block (lanes)

EPS_DET = 1e-10


def _mt_update(tr, cols, carry, vis_col: int, delta=None, motion=None,
               step_ok=None):
    """Dense MT of a (16, SUB) triangle slab against the tile; returns
    updated (best_t, best_id, best_u, best_v), each f32[RAY_TILE, 1].

    `tr` f32[16, SUB] (comp_table layout: rows 0-8 v0|v1|v2 components,
    9 cam-vis, 10 shadow-vis, 11 prim id / -2 padding); `cols` the
    per-tile ray columns (ox..oz, dx..dz, t_min, excl), each [N, 1] —
    possibly instance-transformed (then `delta` rebases the physical
    prim ids to virtual ids). `motion` (tr1, tr2|None, w0, w1, w2):
    per-ray b-spline blend of the vertex rows for motion blur
    (primitive_triangle_bspline.cc:40-44) — vertices become [N, SUB]."""
    ox, oy, oz, dx, dy, dz, t_min, excl = cols
    best_t, best_id, best_u, best_v = carry

    def row(r):
        v = tr[r:r + 1, :]
        if motion is None:
            return v
        tr1, tr2, w0, w1, w2 = motion
        v = v * w0 + tr1[r:r + 1, :] * w1
        if tr2 is not None:
            v = v + tr2[r:r + 1, :] * w2
        return v

    ax, ay, az = row(0), row(1), row(2)
    bx, by, bz = row(3), row(4), row(5)
    cx, cy, cz = row(6), row(7), row(8)
    vis = tr[vis_col:vis_col + 1, :]
    pid = tr[11:12, :]
    if delta is not None:
        pid = pid + delta

    e1x, e1y, e1z = bx - ax, by - ay, bz - az       # [1, SUB]
    e2x, e2y, e2z = cx - ax, cy - ay, cz - az
    # pvec = d x e2 — [N, SUB] per component
    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    ok = jnp.abs(det) > EPS_DET
    inv_det = jnp.where(ok, 1.0, 0.0) / jnp.where(ok, det, 1.0)
    tvx, tvy, tvz = ox - ax, oy - ay, oz - az
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
    hit = (ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
           & (t > t_min) & (t <= best_t)
           & (vis > 0.5) & (pid != excl))
    if step_ok is not None:
        # unrolled candidate steps past the list end contribute nothing
        hit = hit & step_ok
    t = jnp.where(hit, t, jnp.inf)
    tc = jnp.min(t, axis=1, keepdims=True)            # [N, 1]
    better = tc < best_t
    # exact-t tie inside a slab: pick the lowest prim id and its u/v,
    # matching the scan oracle's first-index tie-break
    win = t <= tc
    cid = jnp.min(jnp.where(win, pid, jnp.inf), axis=1, keepdims=True)
    sel = win & (pid == cid)
    best_id = jnp.where(better, cid, best_id)
    best_u = jnp.where(better, jnp.max(jnp.where(sel, u, -jnp.inf),
                                       axis=1, keepdims=True), best_u)
    best_v = jnp.where(better, jnp.max(jnp.where(sel, v, -jnp.inf),
                                       axis=1, keepdims=True), best_v)
    best_t = jnp.where(better, tc, best_t)
    return best_t, best_id, best_u, best_v


def _tile_kernel(rays_ref, cand_ref, ent_ref, count_ref, tab_ref,
                 t_ref, id_ref, u_ref, v_ref, buf0, buf1, sem, *,
                 block_rows: int, c_pad: int, vis_col: int, any_hit: bool,
                 inst_refs=None, cover_order: bool = False):
    """One ray tile through its front-to-back candidate block list.

    Double-buffered: buf0/buf1 alternate as DMA destination vs compute
    source. Slot selection is fully predicated (pl.when / lax.cond on
    static buffer refs) — Mosaic cannot slice a scratch memref by a
    dynamic leading index.

    `inst_refs` (instanced scenes only) = (blk_base, blk_minv, id_delta,
    inv_rows) SMEM refs: candidates index VIRTUAL blocks that indirect to
    physical tab rows; rays are transformed object<-world per block."""
    cnt = count_ref[0, 0, 0]
    t_max = rays_ref[:, 7:8]
    t_min_c = rays_ref[:, 6:7]
    n_sub = block_rows // SUB

    def phys(jv):
        if inst_refs is None:
            return jv
        return inst_refs[0][0, 0, jv]

    def dma(buf_ref, slot_i, ci):
        j = cand_ref[0, 0, jnp.minimum(ci, c_pad - 1)]
        return pltpu.make_async_copy(tab_ref.at[phys(j)], buf_ref,
                                     sem.at[slot_i])

    @pl.when(cnt > 0)
    def _():
        dma(buf0, 0, 0).start()

    def cond(st):
        best_t, best_id, _, _, c = st
        if any_hit and cover_order:
            unhit = (best_id < 0.0) & (t_max >= t_min_c)
            return (c < cnt) & jnp.any(unhit)
        ent = ent_ref[0, 0, jnp.minimum(c, c_pad - 1)]
        if any_hit:
            live_max = jnp.max(jnp.where(best_id < 0.0, best_t, -jnp.inf))
            return (c < cnt) & (ent <= live_max)
        return (c < cnt) & (ent <= jnp.max(best_t))

    def body(st):
        best_t, best_id, best_u, best_v, c = st
        is0 = jax.lax.rem(c, 2) == 0
        # start the next block's fetch into the OTHER buffer before
        # consuming this one
        @pl.when((c + 1 < cnt) & is0)
        def _():
            dma(buf1, 1, c + 1).start()

        @pl.when((c + 1 < cnt) & jnp.logical_not(is0))
        def _():
            dma(buf0, 0, c + 1).start()

        @pl.when(is0)
        def _():
            dma(buf0, 0, c).wait()

        @pl.when(jnp.logical_not(is0))
        def _():
            dma(buf1, 1, c).wait()

        rays = rays_ref[:, :]
        base_cols = (rays[:, 0:1], rays[:, 1:2], rays[:, 2:3],
                     rays[:, 3:4], rays[:, 4:5], rays[:, 5:6],
                     rays[:, 6:7], rays[:, 8:9])
        delta = None
        if inst_refs is None:
            cols = base_cols
        else:
            jv = cand_ref[0, 0, jnp.minimum(c, c_pad - 1)]
            mi = inst_refs[1][0, 0, jv]
            delta = inst_refs[2][0, 0, jv].astype(jnp.float32)
            inv = inst_refs[3]

            def xform():
                ox, oy, oz, dx, dy, dz, tmn, exc = base_cols
                m = [inv[mi, i] for i in range(12)]
                oq = (m[0] * ox + m[1] * oy + m[2] * oz + m[3],
                      m[4] * ox + m[5] * oy + m[6] * oz + m[7],
                      m[8] * ox + m[9] * oy + m[10] * oz + m[11])
                dq = (m[0] * dx + m[1] * dy + m[2] * dz,
                      m[4] * dx + m[5] * dy + m[6] * dz,
                      m[8] * dx + m[9] * dy + m[10] * dz)
                return oq + dq + (tmn, exc)

            # static blocks (row 0 = identity) skip the transform math
            cols = jax.lax.cond(mi > 0, xform, lambda: base_cols)

        def sub_body(k, carry):
            tr = jax.lax.cond(
                is0,
                lambda: buf0[:, pl.ds(k * SUB, SUB)],
                lambda: buf1[:, pl.ds(k * SUB, SUB)])
            return _mt_update(tr, cols, carry, vis_col, delta=delta)

        carry = (best_t, best_id, best_u, best_v)
        if n_sub == 1:
            carry = sub_body(0, carry)
        else:
            carry = jax.lax.fori_loop(0, n_sub, sub_body, carry)
        best_t, best_id, best_u, best_v = carry
        return best_t, best_id, best_u, best_v, c + 1

    init = (t_max, jnp.full_like(t_max, -1.0), jnp.zeros_like(t_max),
            jnp.zeros_like(t_max), jnp.int32(0))
    best_t, best_id, best_u, best_v, c_fin = jax.lax.while_loop(
        cond, body, init)
    # drain: on early exit the prefetch for candidate c_fin is still in
    # flight — wait for it, or its semaphore increment leaks into the
    # next grid step and corrupts DMA accounting (hardware abort)
    fin0 = jax.lax.rem(c_fin, 2) == 0

    @pl.when((c_fin < cnt) & fin0)
    def _():
        dma(buf0, 0, c_fin).wait()

    @pl.when((c_fin < cnt) & jnp.logical_not(fin0))
    def _():
        dma(buf1, 1, c_fin).wait()
    t_ref[:, :] = best_t
    id_ref[:, :] = best_id
    u_ref[:, :] = best_u
    v_ref[:, :] = best_v


# blocks per superblock in the exact per-ray candidate prepass. 1 =
# per-BLOCK exact candidates (tightest unions + best front-to-back
# ordering); measured monotonically better down to 1 on v5e for
# incoherent wavefronts (bounce 2.0 -> 3.9, env-shadow 1.5 -> 2.9
# Mrays/s on the 203k-tri scene) and affordable at any scene size
# because the block count is capped at MAX_BLOCKS=4096 (the block SIZE
# grows instead). >1 trades union tightness for a smaller [N, C/SUPER]
# prepass. Env override for experiments.
SUPER = int(_os.environ.get("YAF_SUPER", "1"))

# candidate blocks intersected per while iteration in the VMEM-resident
# kernel. >1 amortizes per-iteration scalar/control overhead (SMEM
# candidate reads, the early-exit max-reduce, loop bookkeeping) over more
# dense MT work, at the cost of early-exit granularity. Env override for
# experiments; default from the r5 on-chip sweep.
# r5 end-to-end sweep on the 203k-tri bench scene (BENCH_r05 stage
# table): closest-hit 4->6 and any-hit 1->6 unroll cut the traversal
# stage 354 -> 258 ms (612k -> 892k rays/s with the dead-chunk prepass
# skip). 8 crashes the remote Mosaic compile; the earlier any-hit=4
# full-pass regression was confounded with the (now default-off) top-K
# prepass — re-measured separately, deeper any-hit unroll wins too.
UNROLL = int(_os.environ.get("YAF_TILE_UNROLL", "6"))
UNROLL_ANY = int(_os.environ.get("YAF_TILE_UNROLL_ANY", "6"))


def _tile_kernel_resident(rays_ref, cand_ref, ent_ref, count_ref, tab_ref,
                          t_ref, id_ref, u_ref, v_ref, *,
                          block_rows: int, c_pad: int, vis_col: int,
                          any_hit: bool, inst_refs=None, motion_refs=None,
                          cover_order: bool = False):
    """VMEM-resident variant of _tile_kernel: the WHOLE component-major
    block table lives in VMEM for the kernel's lifetime (fetched once by
    Pallas — the constant index_map makes every grid step reuse it), so a
    candidate step is a direct dynamic slice instead of an HBM DMA.
    On this chip class (v5e, 128 MB VMEM) any scene up to ~1.5M triangles
    fits; larger scenes take the double-buffered DMA kernel."""
    cnt = count_ref[0, 0, 0]
    t_max = rays_ref[:, 7:8]
    t_min_c = rays_ref[:, 6:7]
    n_sub = block_rows // SUB

    def phys(jv):
        if inst_refs is None:
            return jv
        return inst_refs[0][0, 0, jv]

    def cond(st):
        best_t, best_id, _, _, c = st
        if any_hit and cover_order:
            # candidates are coverage-ordered (tile_candidates any_hit):
            # run until every live ray has a hit or the list is exhausted
            # (each ray's [t_min, t_max] pruning is already encoded in
            # candidate membership by the exact prepass)
            unhit = (best_id < 0.0) & (t_max >= t_min_c)
            return (c < cnt) & jnp.any(unhit)
        ent = ent_ref[0, 0, jnp.minimum(c, c_pad - 1)]
        if any_hit:
            live_max = jnp.max(jnp.where(best_id < 0.0, best_t, -jnp.inf))
            return (c < cnt) & (ent <= live_max)
        return (c < cnt) & (ent <= jnp.max(best_t))

    rays = rays_ref[:, :]
    base_cols = (rays[:, 0:1], rays[:, 1:2], rays[:, 2:3],
                 rays[:, 3:4], rays[:, 4:5], rays[:, 5:6],
                 rays[:, 6:7], rays[:, 8:9])
    if motion_refs is not None:
        tt = rays[:, 9:10]
        if motion_refs[1] is not None:  # quadratic b-spline, 3 ctrl pts
            tc = 1.0 - tt
            mw = (tc * tc, 2.0 * tt * tc, tt * tt)
        else:                            # linear, 2 keyframes
            mw = (1.0 - tt, tt, tt)

    def one_step(ci, carry, guarded: bool):
        """Intersect candidate `ci`'s block against the tile. `guarded`
        steps may run past the candidate list (loop unrolling): their
        hits are masked out via step_ok instead of branching."""
        jv = cand_ref[0, 0, jnp.minimum(ci, c_pad - 1)]
        jp = phys(jv)
        delta = None
        if inst_refs is None:
            cols = base_cols
        else:
            mi = inst_refs[1][0, 0, jv]
            delta = inst_refs[2][0, 0, jv].astype(jnp.float32)
            inv = inst_refs[3]

            def xform():
                ox, oy, oz, dx, dy, dz, tmn, exc = base_cols
                m = [inv[mi, i] for i in range(12)]
                oq = (m[0] * ox + m[1] * oy + m[2] * oz + m[3],
                      m[4] * ox + m[5] * oy + m[6] * oz + m[7],
                      m[8] * ox + m[9] * oy + m[10] * oz + m[11])
                dq = (m[0] * dx + m[1] * dy + m[2] * dz,
                      m[4] * dx + m[5] * dy + m[6] * dz,
                      m[8] * dx + m[9] * dy + m[10] * dz)
                return oq + dq + (tmn, exc)

            cols = jax.lax.cond(mi > 0, xform, lambda: base_cols)
        step_ok = (ci < cnt) if guarded else None

        def sub_body(k, carry):
            tr = tab_ref[jp, :, pl.ds(k * SUB, SUB)]
            motion = None
            if motion_refs is not None:
                tr1 = motion_refs[0][jp, :, pl.ds(k * SUB, SUB)]
                tr2 = (motion_refs[1][jp, :, pl.ds(k * SUB, SUB)]
                       if motion_refs[1] is not None else None)
                motion = (tr1, tr2) + mw
            return _mt_update(tr, cols, carry, vis_col, delta=delta,
                              motion=motion, step_ok=step_ok)

        if n_sub == 1:
            return sub_body(0, carry)
        return jax.lax.fori_loop(0, n_sub, sub_body, carry)

    # unroll CLOSEST-HIT queries aggressively; any-hit lanes finish on
    # their first hit, so unrolled candidate steps after the exit point
    # are waste — measured 966 ms vs 821 ms full-pass regression at
    # UNROLL=4 on shadow queries (r5 probe_pass); a separate (default 1)
    # knob lets any-hit trade one wasted step for half the loop overhead
    unroll = UNROLL_ANY if any_hit else UNROLL

    def body(st):
        best_t, best_id, best_u, best_v, c = st
        carry = (best_t, best_id, best_u, best_v)
        # `unroll` candidates per while iteration: amortizes the per-
        # iteration scalar/control overhead (SMEM reads, early-exit
        # reduce, loop bookkeeping) over more VPU work. Steps past the
        # list end are mask-gated, and early exit coarsens to unroll-
        # candidate granularity — measured net win on v5e for closest
        # hits (r5 sweep: shadow_env 176->124 ms, bounce1 133->97 ms).
        carry = one_step(c, carry, guarded=False)
        for k in range(1, unroll):
            carry = one_step(c + k, carry, guarded=True)
        best_t, best_id, best_u, best_v = carry
        return best_t, best_id, best_u, best_v, c + unroll

    init = (t_max, jnp.full_like(t_max, -1.0), jnp.zeros_like(t_max),
            jnp.zeros_like(t_max), jnp.int32(0))
    best_t, best_id, best_u, best_v, _ = jax.lax.while_loop(cond, body, init)
    t_ref[:, :] = best_t
    id_ref[:, :] = best_id
    u_ref[:, :] = best_u
    v_ref[:, :] = best_v


# scenes whose block table fits under this budget keep it VMEM-resident
# for the whole traversal (no per-step DMA); bigger scenes double-buffer
VMEM_TAB_BUDGET = 96 * 1024 * 1024


# two-stage prepass: blocks per tile refined by the exact per-ray pass.
# The cheap per-tile interval test ranks all C blocks; only the K nearest
# get the expensive exact [rays x blocks] slab pass (the rest keep their
# conservative interval keys — correct, just less tightly ordered).
# DEFAULT OFF (0 = exact pass over all C): measured on the 203k-tri bench
# scene, K=256 cut the prepass but incoherent shadow tiles overflow K
# (p99 interval candidates > 500) and their degenerate interval keys blow
# the kernel time up 2x (the exact r4 "169 vs 31 cand/tile" failure mode)
# — net pass regression 821 -> 1090 ms. Kept for scenes/ray mixes where
# the interval count tail is below K.
CAND_K = int(_os.environ.get("YAF_CAND_K", "0"))


def tile_candidates(bmin, bmax, o, d, t_min, t_max, any_hit: bool = False):
    """Per-tile conservative candidate block lists.

    Rays must already be sorted/coherent and padded to a RAY_TILE
    multiple. Returns (cand i32[T, Cpad], ent f32[T, Cpad],
    count i32[T, 1]) with candidates sorted front-to-back by a LOWER
    bound on the slab entry distance (so kernel early-exit is exact:
    once ent > best_t for every ray no nearer hit can exist).

    The candidate set is the EXACT per-ray slab overlap at (super)block
    granularity — a block survives only if some ray actually enters its
    (super)block AABB within its live t-range, and the entry key is the
    tile-min of the exact per-ray entries, so front-to-back ordering is
    real even for incoherent wavefronts. (The per-tile interval slab
    test used in earlier rounds DEGENERATES there: near-zero direction
    components blow the inverse intervals up to +-1e12 and nearly all C
    blocks became candidates with entry ~tmin — 169 cand/tile measured
    on the 203k-tri bench scene vs 31 exact.) With SUPER > 1 the exact
    pass runs on superblock AABBs and the interval test refines within,
    trading union tightness for a smaller [N, S] pass.

    With CAND_K > 0 (and SUPER == 1) the exact per-ray pass runs only on
    each tile's K nearest blocks by the interval lower bound — a 6x+ cut
    of the dominant [rays x C] slab work on the bench scene (C=1591,
    K=256). Blocks beyond the K nearest keep their interval keys: a
    SUPERSET with conservative front-to-back ordering, so correctness is
    unaffected; only tiles whose interval candidate count exceeds K (p99
    tail of incoherent wavefronts) do extra in-kernel work.
    """
    c = bmin.shape[0]
    n = o.shape[0]
    t = n // RAY_TILE
    if SUPER == 1 and 0 < CAND_K < c:
        return _tile_candidates_topk(bmin, bmax, o, d, t_min, t_max)
    want_cover = any_hit and SUPER == 1
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                          jnp.where(d < 0, -1e-12, 1e-12), d)
    ot = o.reshape(t, RAY_TILE, 3)
    it_ = inv.reshape(t, RAY_TILE, 3)
    tmin_lo = jnp.min(t_min.reshape(t, RAY_TILE), 1)
    tmax_hi = jnp.max(t_max.reshape(t, RAY_TILE), 1)

    if SUPER > 1:
        olo, ohi = jnp.min(ot, 1), jnp.max(ot, 1)
        ilo, ihi = jnp.min(it_, 1), jnp.max(it_, 1)

        def ival_mul(p_lo, p_hi):
            # interval product [p_lo,p_hi] x [ilo,ihi] -> [lo, hi]
            a = p_lo * ilo[:, None]
            b = p_lo * ihi[:, None]
            cc = p_hi * ilo[:, None]
            dd = p_hi * ihi[:, None]
            return (jnp.minimum(jnp.minimum(a, b), jnp.minimum(cc, dd)),
                    jnp.maximum(jnp.maximum(a, b), jnp.maximum(cc, dd)))

        a_lo, a_hi = ival_mul(bmin[None] - ohi[:, None],
                              bmin[None] - olo[:, None])
        b_lo, b_hi = ival_mul(bmax[None] - ohi[:, None],
                              bmax[None] - olo[:, None])
        near_lo = jnp.minimum(a_lo, b_lo)  # [T, C, 3] lower bnd of min(a,b)
        far_hi = jnp.maximum(a_hi, b_hi)   # upper bnd of max(a,b)
        tile_near = jnp.max(near_lo, -1)   # [T, C] lower bnd of slab entry
        tile_far = jnp.min(far_hi, -1)     # upper bnd of slab exit
        overlap = ((tile_near <= tile_far) & (tile_far >= tmin_lo[:, None])
                   & (tile_near <= tmax_hi[:, None]))
        key = jnp.maximum(tile_near, tmin_lo[:, None])

    # ---- exact per-ray (super)block slab pass ----
    s = -(-c // SUPER)
    pad_c = s * SUPER - c
    bm = bmin if pad_c == 0 else jnp.concatenate(
        [bmin, jnp.full((pad_c, 3), jnp.inf, jnp.float32)])
    bx = bmax if pad_c == 0 else jnp.concatenate(
        [bmax, jnp.full((pad_c, 3), -jnp.inf, jnp.float32)])
    sb_min = jnp.min(bm.reshape(s, SUPER, 3), axis=1)   # [S, 3]
    sb_max = jnp.max(bx.reshape(s, SUPER, 3), axis=1)

    def tile_chunk(args):
        # exact slab of one chunk of tiles' rays against all superblocks.
        # Dead rays (empty t-range: terminated paths, gated shadow rays)
        # sort to the END of the wavefront (accel/blocks.py sort key), so
        # whole trailing chunks are often all-dead — lax.cond skips their
        # [G, R, S] slab work entirely (on the 203k-tri bench the
        # depth-2 wavefronts are majority-dead)
        oc, ic, t0c, t1c = args                       # [G, R, 3] etc.

        def live(_):
            ta = (sb_min[None, None] - oc[:, :, None]) * ic[:, :, None]
            tb = (sb_max[None, None] - oc[:, :, None]) * ic[:, :, None]
            tn = jnp.max(jnp.minimum(ta, tb), -1)      # [G, R, S]
            tf = jnp.min(jnp.maximum(ta, tb), -1)
            ok = ((tn <= tf) & (tf >= t0c[..., None])
                  & (tn <= t1c[..., None]))
            er = jnp.where(ok, jnp.maximum(tn, t0c[..., None]), jnp.inf)
            ent_blk = jnp.min(er, axis=1)              # [G, S] exact entry
            if want_cover:
                return ent_blk, jnp.sum(ok, axis=1).astype(jnp.float32)
            return ent_blk

        def dead(_):
            g_ = oc.shape[0]
            ent_blk = jnp.full((g_, s), jnp.inf, jnp.float32)
            if want_cover:
                return ent_blk, jnp.zeros((g_, s), jnp.float32)
            return ent_blk

        return jax.lax.cond(jnp.any(t1c >= t0c), live, dead, None)

    # chunk tiles so the [G, R, S, 3] f32 intermediates stay <= ~64 MB
    # (measured on v5e: larger 384 MB chunks ran ~5% SLOWER end-to-end —
    # the many-small-steps lax.map pipelines better than few huge fusions)
    g = max(1, min(t, int(64e6 / (RAY_TILE * s * 12))))
    tpad = -(-t // g) * g
    def padt(x, fill):
        return x if tpad == t else jnp.concatenate(
            [x, jnp.full((tpad - t,) + x.shape[1:], fill, x.dtype)])
    ocs = padt(ot, 0.0).reshape(tpad // g, g, RAY_TILE, 3)
    ics = padt(it_, 1.0).reshape(tpad // g, g, RAY_TILE, 3)
    t0s = padt(t_min.reshape(t, RAY_TILE), 0.0).reshape(tpad // g, g, RAY_TILE)
    t1s = padt(t_max.reshape(t, RAY_TILE), -1.0).reshape(tpad // g, g, RAY_TILE)
    out = jax.lax.map(tile_chunk, (ocs, ics, t0s, t1s))
    if want_cover:
        sb_ent, sb_cover = out
        sb_cover = sb_cover.reshape(tpad, s)[:t]
    else:
        sb_ent = out
    sb_ent = sb_ent.reshape(tpad, s)[:t]               # [T, S] inf = miss

    if SUPER > 1:
        sb_of_blk = jnp.arange(c, dtype=jnp.int32) // SUPER
        sb_ent_blk = sb_ent[:, sb_of_blk]              # [T, C]
        overlap = overlap & jnp.isfinite(sb_ent_blk)
        key = jnp.maximum(key, sb_ent_blk)
    else:
        # SUPER == 1: the exact pass IS block-granular — the interval
        # test is strictly looser and skipped entirely
        key = sb_ent
        overlap = jnp.isfinite(key)
    # ---- end candidate tests ----

    if want_cover:
        # any-hit queries don't need front-to-back: membership already
        # encodes each ray's [t_min, t_max] pruning, and termination is
        # "no unhit live ray remains" (the kernel's any-hit cond), so the
        # best order is DESCENDING ray coverage. `ent` then carries
        # -coverage, which the any-hit kernels never read as a distance.
        key = -sb_cover
    key = jnp.where(overlap, key, jnp.inf)
    ent, cand = jax.lax.sort(
        (key, jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32), (t, c))),
        dimension=1, num_keys=1)
    count = jnp.sum(overlap, axis=1, dtype=jnp.int32).reshape(t, 1)
    c_pad = -(-c // 128) * 128
    if c_pad != c:
        ent = jnp.concatenate(
            [ent, jnp.full((t, c_pad - c), jnp.inf, jnp.float32)], axis=1)
        cand = jnp.concatenate(
            [cand, jnp.zeros((t, c_pad - c), jnp.int32)], axis=1)
    return cand, ent, count


def _tile_candidates_topk(bmin, bmax, o, d, t_min, t_max):
    """Two-stage candidate pass (see tile_candidates docstring): per-tile
    interval slab over all C blocks -> exact per-ray slab on each tile's
    K nearest -> exact keys scattered back over the interval keys."""
    c = bmin.shape[0]
    n = o.shape[0]
    t = n // RAY_TILE
    k = CAND_K
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                          jnp.where(d < 0, -1e-12, 1e-12), d)
    ot = o.reshape(t, RAY_TILE, 3)
    it_ = inv.reshape(t, RAY_TILE, 3)
    t0t = t_min.reshape(t, RAY_TILE)
    t1t = t_max.reshape(t, RAY_TILE)
    tmin_lo = jnp.min(t0t, 1)
    tmax_hi = jnp.max(t1t, 1)

    # ---- stage 1: interval slab test, all C blocks (cheap [T, C]) ----
    olo, ohi = jnp.min(ot, 1), jnp.max(ot, 1)
    ilo, ihi = jnp.min(it_, 1), jnp.max(it_, 1)

    def ival_mul(p_lo, p_hi):
        a = p_lo * ilo[:, None]
        b = p_lo * ihi[:, None]
        cc = p_hi * ilo[:, None]
        dd = p_hi * ihi[:, None]
        return (jnp.minimum(jnp.minimum(a, b), jnp.minimum(cc, dd)),
                jnp.maximum(jnp.maximum(a, b), jnp.maximum(cc, dd)))

    a_lo, a_hi = ival_mul(bmin[None] - ohi[:, None],
                          bmin[None] - olo[:, None])
    b_lo, b_hi = ival_mul(bmax[None] - ohi[:, None],
                          bmax[None] - olo[:, None])
    near_lo = jnp.minimum(a_lo, b_lo)
    far_hi = jnp.maximum(a_hi, b_hi)
    tile_near = jnp.max(near_lo, -1)          # [T, C] entry lower bound
    tile_far = jnp.min(far_hi, -1)
    overlap = ((tile_near <= tile_far) & (tile_far >= tmin_lo[:, None])
               & (tile_near <= tmax_hi[:, None]))
    key = jnp.where(overlap, jnp.maximum(tile_near, tmin_lo[:, None]),
                    jnp.inf)

    # ---- stage 2: exact per-ray slab on the K nearest blocks ----
    iota_c = jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32), (t, c))
    key_sorted, cand_sorted = jax.lax.sort((key, iota_c), dimension=1,
                                           num_keys=1)
    sel = cand_sorted[:, :k]                  # [T, K] nearest block ids
    bm_k = bmin[sel]                          # [T, K, 3]
    bx_k = bmax[sel]

    def tile_chunk(args):
        oc, ic, t0c, t1c, bmc, bxc = args     # [G,R,3] / [G,K,3]
        ta = (bmc[:, None] - oc[:, :, None]) * ic[:, :, None]
        tb = (bxc[:, None] - oc[:, :, None]) * ic[:, :, None]
        tn = jnp.max(jnp.minimum(ta, tb), -1)  # [G, R, K]
        tf = jnp.min(jnp.maximum(ta, tb), -1)
        ok = (tn <= tf) & (tf >= t0c[..., None]) & (tn <= t1c[..., None])
        er = jnp.where(ok, jnp.maximum(tn, t0c[..., None]), jnp.inf)
        return jnp.min(er, axis=1)             # [G, K] exact tile entry

    g = max(1, min(t, int(64e6 / (RAY_TILE * k * 12))))
    tpad = -(-t // g) * g

    def padt(x, fill):
        return x if tpad == t else jnp.concatenate(
            [x, jnp.full((tpad - t,) + x.shape[1:], fill, x.dtype)])
    ocs = padt(ot, 0.0).reshape(tpad // g, g, RAY_TILE, 3)
    ics = padt(it_, 1.0).reshape(tpad // g, g, RAY_TILE, 3)
    t0s = padt(t0t, 0.0).reshape(tpad // g, g, RAY_TILE)
    t1s = padt(t1t, -1.0).reshape(tpad // g, g, RAY_TILE)
    bms = padt(bm_k, jnp.inf).reshape(tpad // g, g, k, 3)
    bxs = padt(bx_k, -jnp.inf).reshape(tpad // g, g, k, 3)
    er_k = jax.lax.map(tile_chunk, (ocs, ics, t0s, t1s, bms, bxs))
    er_k = er_k.reshape(tpad, k)[:t]          # [T, K] exact (inf = miss)

    # exact keys replace the interval keys for the selected blocks (a
    # refinement: exact >= interval lower bound, and exact-inf REMOVES
    # false-positive candidates)
    rows = jnp.arange(t, dtype=jnp.int32)[:, None]
    key = key.at[rows, sel].set(er_k)
    overlap = jnp.isfinite(key)

    ent, cand = jax.lax.sort((key, iota_c), dimension=1, num_keys=1)
    count = jnp.sum(overlap, axis=1, dtype=jnp.int32).reshape(t, 1)
    c_pad = -(-c // 128) * 128
    if c_pad != c:
        ent = jnp.concatenate(
            [ent, jnp.full((t, c_pad - c), jnp.inf, jnp.float32)], axis=1)
        cand = jnp.concatenate(
            [cand, jnp.zeros((t, c_pad - c), jnp.int32)], axis=1)
    return cand, ent, count


@functools.partial(jax.jit,
                   static_argnames=("shadow", "any_hit", "interpret"))
def tiles_traverse(tab, bmin, bmax, o, d, t_min, t_max, exclude, *,
                   blk_base=None, blk_minv=None, id_delta=None,
                   inv_rows=None, tab_t1=None, tab_t2=None, time=None,
                   shadow: bool = False,
                   any_hit: bool = False, interpret: bool = False):
    """Traverse pre-sorted rays through the block table.

    Args: tab f32[C_phys, 16, B] component-major block slabs
    (BlockAccel.tab); bmin/bmax f32[C, 3] per VIRTUAL block; o,d f32[N,3]
    SORTED for coherence (N padded to a RAY_TILE multiple here if
    needed); t_min/t_max/exclude [N]. For instanced scenes, blk_base /
    blk_minv / id_delta i32[C] and inv_rows f32[K+1, 12] carry the
    virtual->physical indirection (BlockAccel docstring). For motion
    blur pass tab_t1 (+tab_t2 for quadratic b-spline) and per-ray
    `time` [N]: vertices are blended per ray inside the kernel
    (VMEM-resident scenes only — larger scenes use the jnp block loop).
    Returns (t, prim i32 (-1 miss), u, v) each [N]."""
    n = o.shape[0]
    block_rows = tab.shape[2]
    instanced = blk_base is not None
    motion = tab_t1 is not None and time is not None
    npad = -(-n // RAY_TILE) * RAY_TILE
    if npad != n:
        z3 = jnp.zeros((npad - n, 3), jnp.float32)
        o = jnp.concatenate([o, z3])
        d = jnp.concatenate([d, jnp.ones((npad - n, 3), jnp.float32)])
        t_min = jnp.concatenate([t_min, jnp.zeros((npad - n,), jnp.float32)])
        t_max = jnp.concatenate(
            [t_max, jnp.full((npad - n,), -1.0, jnp.float32)])
        exclude = jnp.concatenate(
            [exclude, jnp.full((npad - n,), -1, jnp.int32)])
        if motion:
            time = jnp.concatenate(
                [time, jnp.zeros((npad - n,), jnp.float32)])
    # coverage-ordered any-hit candidates: measured slightly NEGATIVE on
    # the 203k-tri bench scene (646k vs 675k rays/s end-to-end — the
    # coverage side-reduce in the prepass and the lost ent-based early
    # stop outweigh the faster lane kills), so OPT-IN for experiments
    cover_order = (any_hit and SUPER == 1
                   and _os.environ.get("YAF_COVER_ORDER", "0") == "1"
                   and not (0 < CAND_K < bmin.shape[0]))
    cand, ent, count = tile_candidates(bmin, bmax, o, d, t_min, t_max,
                                       any_hit=cover_order)
    c_pad = cand.shape[1]
    t = npad // RAY_TILE
    n_tabs = 1 + (2 if motion else 0)
    resident = tab.size * 4 * n_tabs <= VMEM_TAB_BUDGET
    if motion and not resident:
        raise ValueError("motion-blur tiles path needs the VMEM-resident "
                         "kernel; scene too large — use the jnp block loop")

    rays = jnp.concatenate(
        [o, d, t_min[:, None], t_max[:, None],
         exclude.astype(jnp.float32)[:, None],
         (time[:, None] if motion else jnp.zeros((npad, 1), jnp.float32)),
         jnp.zeros((npad, 6), jnp.float32)], axis=1)

    base_kernel = _tile_kernel_resident if resident else _tile_kernel
    vis_col = 10 if shadow else 9
    has_t2 = motion and tab_t2 is not None
    n_mot = (2 if has_t2 else 1) if motion else 0
    n_inst = 4 if instanced else 0

    def kernel(rays_r, cand_r, ent_r, cnt_r, tab_r, *rest):
        # rest = [motion tabs][inst tables][outputs (+DMA scratch)]
        kw = {}
        if motion:
            kw["motion_refs"] = (rest[0], rest[1] if has_t2 else None)
        if instanced:
            kw["inst_refs"] = tuple(rest[n_mot:n_mot + 4])
        base_kernel(rays_r, cand_r, ent_r, cnt_r, tab_r,
                    *rest[n_mot + n_inst:],
                    block_rows=block_rows, c_pad=c_pad,
                    vis_col=vis_col, any_hit=any_hit,
                    cover_order=cover_order, **kw)
    vec_spec = pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    vec_shape = jax.ShapeDtypeStruct((npad, 1), jnp.float32)
    in_specs = [
        pl.BlockSpec((RAY_TILE, 16), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        # 3D with a singleton sublane dim: Mosaic requires the last
        # two block dims be (8,128)-divisible OR equal to the array
        # dims — (1, c_pad) over a [T, 1, c_pad] array satisfies that
        pl.BlockSpec((1, 1, c_pad), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, c_pad), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        # resident: whole table in VMEM, same block every step -> Pallas
        # fetches it once and keeps it on-chip across the grid
        (pl.BlockSpec(tab.shape, lambda i: (0, 0, 0),
                      memory_space=pltpu.VMEM) if resident
         else pl.BlockSpec(memory_space=pltpu.HBM)),
    ]
    args = [rays, cand.reshape(t, 1, c_pad), ent.reshape(t, 1, c_pad),
            count.reshape(t, 1, 1), tab]
    if motion:
        res_spec = pl.BlockSpec(tab.shape, lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)
        in_specs.append(res_spec)
        args.append(tab_t1)
        if has_t2:
            in_specs.append(res_spec)
            args.append(tab_t2)
    if instanced:
        def pad_c(x, fill):
            cc = x.shape[0]
            if cc == c_pad:
                return x.reshape(1, 1, c_pad)
            return jnp.concatenate(
                [x, jnp.full((c_pad - cc,), fill, x.dtype)]
            ).reshape(1, 1, c_pad)
        k1 = inv_rows.shape[0]
        smem_row = pl.BlockSpec((1, 1, c_pad), lambda i: (0, 0, 0),
                                memory_space=pltpu.SMEM)
        in_specs += [smem_row, smem_row, smem_row,
                     pl.BlockSpec((k1, 12), lambda i: (0, 0),
                                  memory_space=pltpu.SMEM)]
        args += [pad_c(blk_base, 0), pad_c(blk_minv, 0),
                 pad_c(id_delta, 0), inv_rows]
    out_t, out_id, out_u, out_v = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=in_specs,
        out_specs=(vec_spec, vec_spec, vec_spec, vec_spec),
        out_shape=(vec_shape, vec_shape, vec_shape, vec_shape),
        scratch_shapes=[] if resident else [
            pltpu.VMEM((16, block_rows), jnp.float32),
            pltpu.VMEM((16, block_rows), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=45 * npad * 16 * block_rows,
            bytes_accessed=npad * (16 + 4 * 4) * 4
            + (tab.size * 4 if resident
               else t * 16 * block_rows * 16 * 4),
            transcendentals=0),
        interpret=interpret,
    )(*args)
    return (out_t[:n, 0], out_id[:n, 0].astype(jnp.int32),
            out_u[:n, 0], out_v[:n, 0])


_TILES_STATUS: bool | None = None


def _probe() -> bool:
    """Compile + run a tiny traversal on the live backend and verify the
    answer; any failure disables the tiles kernel for the process (the
    jnp block loop then carries traversal), mirroring
    pallas_intersect.use_pallas."""
    import jax as _jax
    if _jax.default_backend() != "tpu":
        return False
    try:
        import numpy as np
        b = 128
        tab = np.zeros((2, 16, b), np.float32)
        # block 0: one unit triangle in the x=1 plane; block 1: at x=3
        for blk, x in ((0, 1.0), (1, 3.0)):
            tab[blk, 0:9, 0] = [x, -1.0, -1.0, x, 1.0, -1.0, x, 0.0, 1.0]
            tab[blk, 9:12, 0] = [1.0, 1.0, float(blk)]
            tab[blk, 11, 1:] = -2.0
        bmin = np.array([[1.0, -1.0, -1.0], [3.0, -1.0, -1.0]], np.float32)
        bmax = np.array([[1.0, 1.0, 1.0], [3.0, 1.0, 1.0]], np.float32)
        o = np.zeros((2, 3), np.float32)
        d = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (2, 1))
        t, p, _, _ = tiles_traverse(
            jnp.asarray(tab), jnp.asarray(bmin), jnp.asarray(bmax),
            jnp.asarray(o), jnp.asarray(d),
            jnp.full((2,), 1e-4, jnp.float32),
            jnp.full((2,), 1e9, jnp.float32),
            jnp.array([-1, 0], jnp.int32))
        t = np.asarray(t)
        p = np.asarray(p)
        ok = (abs(t[0] - 1.0) < 1e-4 and p[0] == 0
              and abs(t[1] - 3.0) < 1e-4 and p[1] == 1)
        if not ok:
            raise RuntimeError(f"probe mismatch: t={t} prim={p}")
        return True
    except Exception as exc:  # pragma: no cover - depends on hw/toolchain
        import warnings
        warnings.warn("tiles traversal kernel disabled, falling back to the "
                      f"jnp block loop (probe failed: {exc})")
        return False


def use_tiles() -> bool:
    """True when the tile-wavefront kernel should carry block traversal.
    Memoized runtime probe executed in a worker thread (JAX trace
    contexts are thread-local; see pallas_intersect.use_pallas)."""
    global _TILES_STATUS
    if _TILES_STATUS is None:
        import os
        if os.environ.get("YAF_TPU_TILES", "1") == "0":
            _TILES_STATUS = False
        else:
            import threading
            result = []
            th = threading.Thread(target=lambda: result.append(_probe()))
            th.start()
            th.join()
            _TILES_STATUS = bool(result and result[0])
    return _TILES_STATUS
