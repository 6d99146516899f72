"""Round-4 diagnostics: VMEM capacity + per-ray-class traversal stats on
the bigmesh (config 3) scene. Run on the real TPU."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

MODE = sys.argv[1] if len(sys.argv) > 1 else "stats"

if MODE == "vmem":
    # binary-search max VMEM scratch a kernel can hold
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def try_mb(mb):
        rows = mb * 1024 * 1024 // (128 * 4)
        def kern(o_ref, s_ref):
            s_ref[0:8, :] = jnp.ones((8, 128), jnp.float32)
            s_ref[rows - 8:rows, :] = jnp.ones((8, 128), jnp.float32)
            o_ref[:, :] = s_ref[0:8, :] + s_ref[rows - 8:rows, :]
        try:
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((rows, 128), jnp.float32)],
            )()
            out.block_until_ready()
            return True
        except Exception as e:
            print(f"  {mb} MB failed: {str(e)[:120]}")
            return False

    lo, hi = 1, 256
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if try_mb(mid):
            lo = mid
            print(f"  {mid} MB ok")
        else:
            hi = mid - 1
    print("max VMEM scratch MB:", lo)
    sys.exit(0)

from libyafaray_tpu.accel.tiles import tile_candidates, tiles_traverse, RAY_TILE
from libyafaray_tpu.accel import blocks as BL
from libyafaray_tpu.cameras import shoot_rays
from libyafaray_tpu import sampler
from scenes import bigmesh_builder

res = int(os.environ.get("MESH_RES", 320))
W = H = int(os.environ.get("IMG_RES", 720))
b = bigmesh_builder(res)
b.cameras["cam"]["resx"] = W
b.cameras["cam"]["resy"] = H
scene = b.compile("cam")
acc = scene.blocks
print("blocks C =", acc.num_blocks, "B =", acc.block_size,
      "tab MB =", acc.tab.size * 4 / 1e6)

yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
pid = jnp.asarray((yy * W + xx).reshape(-1).astype(np.uint32))
px = jnp.asarray((xx.reshape(-1) + 0.5).astype(np.float32))
py = jnp.asarray((yy.reshape(-1) + 0.5).astype(np.float32))
zero = jnp.zeros_like(px)
o, d, valid = shoot_rays(scene.camera, px, py, zero, zero)
n = o.shape[0]
t_min = jnp.full((n,), scene.ray_min_dist, jnp.float32)
t_max = jnp.full((n,), 1e30, jnp.float32)
excl = jnp.full((n,), -1, jnp.int32)


@jax.jit
def sort_rays(o, d, t_min, t_max, excl):
    from libyafaray_tpu.accel.morton import morton3d
    smin = jnp.min(acc.bmin, axis=0)
    sinv = 1.0 / jnp.maximum(jnp.max(acc.bmax, axis=0) - smin, 1e-12)
    rel = jnp.clip((o - smin) * sinv, 0.0, 1.0)
    om = morton3d(rel)
    okey = om >> jnp.uint32(18)
    dkey = morton3d(0.5 * (d + 1.0)) >> jnp.uint32(15)
    oct_ = ((d[:, 0] >= 0).astype(jnp.uint32)
            | ((d[:, 1] >= 0).astype(jnp.uint32) << 1)
            | ((d[:, 2] >= 0).astype(jnp.uint32) << 2))
    dead = (t_max < t_min).astype(jnp.uint32)
    if os.environ.get("YAF_SORT_MODE", "oct") == "org":
        okey_f = om >> jnp.uint32(11)
        key = ((dead << jnp.uint32(30)) | (okey_f << jnp.uint32(9))
               | (oct_ << jnp.uint32(6)) | (dkey >> jnp.uint32(24)))
    else:
        key = ((dead << jnp.uint32(30)) | (oct_ << jnp.uint32(27))
               | (okey << jnp.uint32(15)) | dkey)
    order = jnp.argsort(key).astype(jnp.int32)
    return (o[order], d[order], t_min[order], t_max[order], excl[order])


@jax.jit
def cand_stats(o, d, t_min, t_max):
    nn = o.shape[0]
    npad = -(-nn // RAY_TILE) * RAY_TILE
    if npad != nn:
        o = jnp.concatenate([o, jnp.zeros((npad - nn, 3), jnp.float32)])
        d = jnp.concatenate([d, jnp.ones((npad - nn, 3), jnp.float32)])
        t_min = jnp.concatenate([t_min, jnp.zeros((npad - nn,), jnp.float32)])
        t_max = jnp.concatenate([t_max, jnp.full((npad - nn,), -1.0,
                                                 jnp.float32)])
    cand, ent, count = tile_candidates(acc.bmin, acc.bmax, o, d, t_min, t_max)
    return count


def klass_report(name, o, d, t_min, t_max, excl):
    so, sd, st0, st1, sx = sort_rays(o, d, t_min, t_max, excl)
    cnt = np.asarray(cand_stats(so, sd, st0, st1)).ravel()
    print(f"[{name}] tiles={cnt.size} cand/tile mean={cnt.mean():.1f} "
          f"p50={np.percentile(cnt,50):.0f} p90={np.percentile(cnt,90):.0f} "
          f"p99={np.percentile(cnt,99):.0f} max={cnt.max()}")
    # timing of the production kernel
    f = jax.jit(lambda *a: tiles_traverse(acc.tab, acc.bmin, acc.bmax, *a))
    r = f(so, sd, st0, st1, sx)
    jax.block_until_ready(r)
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        r = f(so, sd, st0, st1, sx)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / reps
    print(f"[{name}] tiles_traverse {dt*1e3:.1f} ms -> "
          f"{o.shape[0]/dt/1e6:.2f} Mrays/s")
    return r


print(f"primary rays n={n}")
rt, rp, ru, rv = klass_report("primary", o, d, t_min, t_max, excl)

# build bounce wavefront: cosine-hemisphere at hit points
hitm = rp >= 0
hp = o + d * rt[:, None]
# geometric normal from prim
tri = scene.geom.faces[jnp.maximum(rp, 0)]
v0 = scene.geom.vertices[tri[:, 0]]
v1 = scene.geom.vertices[tri[:, 1]]
v2 = scene.geom.vertices[tri[:, 2]]
ng = jnp.cross(v1 - v0, v2 - v0)
ng = ng / jnp.maximum(jnp.linalg.norm(ng, axis=-1, keepdims=True), 1e-12)
ng = jnp.where((jnp.sum(ng * d, -1) > 0)[:, None], -ng, ng)
u1 = sampler.rand1(pid, jnp.uint32(3), 1, 70)
u2 = sampler.rand1(pid, jnp.uint32(3), 1, 71)
r_ = jnp.sqrt(u1)
phi = 2 * np.pi * u2
tx = jnp.where(jnp.abs(ng[:, 0:1]) < 0.9,
               jnp.cross(ng, jnp.array([1.0, 0, 0])),
               jnp.cross(ng, jnp.array([0, 1.0, 0])))
tx = tx / jnp.maximum(jnp.linalg.norm(tx, axis=-1, keepdims=True), 1e-12)
tyv = jnp.cross(ng, tx)
db = (tx * (r_ * jnp.cos(phi))[:, None] + tyv * (r_ * jnp.sin(phi))[:, None]
      + ng * jnp.sqrt(jnp.maximum(1 - u1, 0))[:, None])
ob = hp + ng * 1e-4
tmaxb = jnp.where(hitm, 1e30, -1.0)   # dead rays: empty range
klass_report("bounce1", ob, db, t_min, tmaxb, rp)

# shadow wavefront: toward the sun direction-ish (random cone)
sdir = jnp.array([0.3, 0.3, 0.8])
sdir = sdir / jnp.linalg.norm(sdir)
ds = jnp.broadcast_to(sdir, db.shape)
klass_report("shadow_sun", ob, ds, t_min, tmaxb, rp)

# shadow toward env (uniform sphere) — worst case incoherence
u3 = sampler.rand1(pid, jnp.uint32(5), 2, 80)
u4 = sampler.rand1(pid, jnp.uint32(5), 2, 81)
cz = 1 - 2 * u3
szr = jnp.sqrt(jnp.maximum(1 - cz * cz, 0))
de = jnp.stack([szr * jnp.cos(2 * np.pi * u4),
                szr * jnp.sin(2 * np.pi * u4), cz], -1)
klass_report("shadow_env", ob, de, t_min, tmaxb, rp)

# bounce2: cosine from bounce1 hits — most incoherent closest-hit class
rt2, rp2, _, _ = tiles_traverse(acc.tab, acc.bmin, acc.bmax, ob, db,
                                t_min, tmaxb, rp)
hit2 = rp2 >= 0
hp2 = ob + db * rt2[:, None]
tri2 = scene.geom.faces[jnp.maximum(rp2, 0)]
w0 = scene.geom.vertices[tri2[:, 0]]
w1 = scene.geom.vertices[tri2[:, 1]]
w2 = scene.geom.vertices[tri2[:, 2]]
ng2 = jnp.cross(w1 - w0, w2 - w0)
ng2 = ng2 / jnp.maximum(jnp.linalg.norm(ng2, axis=-1, keepdims=True), 1e-12)
ng2 = jnp.where((jnp.sum(ng2 * db, -1) > 0)[:, None], -ng2, ng2)
u5 = sampler.rand1(pid, jnp.uint32(7), 3, 90)
u6 = sampler.rand1(pid, jnp.uint32(7), 3, 91)
r2_ = jnp.sqrt(u5)
phi2 = 2 * np.pi * u6
tx2 = jnp.where(jnp.abs(ng2[:, 0:1]) < 0.9,
                jnp.cross(ng2, jnp.array([1.0, 0, 0])),
                jnp.cross(ng2, jnp.array([0, 1.0, 0])))
tx2 = tx2 / jnp.maximum(jnp.linalg.norm(tx2, axis=-1, keepdims=True), 1e-12)
ty2 = jnp.cross(ng2, tx2)
db2 = (tx2 * (r2_ * jnp.cos(phi2))[:, None]
       + ty2 * (r2_ * jnp.sin(phi2))[:, None]
       + ng2 * jnp.sqrt(jnp.maximum(1 - u5, 0))[:, None])
ob2 = hp2 + ng2 * 1e-4
tmax2 = jnp.where(hit2, 1e30, -1.0)
klass_report("bounce2", ob2, db2, t_min, tmax2, rp2)
