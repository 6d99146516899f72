"""Scratch perf probe: current blocks accel on a ~205k-tri mesh (real TPU)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from libyafaray_tpu import SceneBuilder


def big_mesh_builder(res=320):
    """Displaced terrain grid: 2*(res-1)^2 tris."""
    b = SceneBuilder()
    b.create_material("ground", {"type": "shinydiffusemat",
                                 "color": (0.6, 0.55, 0.5)})
    b.create_object("terrain")
    b.set_current_material("ground")
    xs = np.linspace(0.0, 4.0, res, dtype=np.float32)
    ys = np.linspace(0.0, 4.0, res, dtype=np.float32)
    xx, yy = np.meshgrid(xs, ys, indexing="ij")
    zz = (0.35 * np.sin(xx * 2.3) * np.cos(yy * 1.7)
          + 0.12 * np.sin(xx * 9.1 + 1.0) * np.sin(yy * 8.3)
          + 0.04 * np.sin(xx * 31.0) * np.cos(yy * 29.0)).astype(np.float32)
    verts = np.stack([xx, yy, zz], axis=-1).reshape(-1, 3)
    i = np.arange(res * res).reshape(res, res)
    a = i[:-1, :-1].ravel(); bq = i[1:, :-1].ravel()
    c = i[1:, 1:].ravel(); dq = i[:-1, 1:].ravel()
    faces = np.concatenate([np.stack([a, bq, c], -1),
                            np.stack([a, c, dq], -1)]).astype(np.int32)
    b.add_mesh_arrays(verts, faces)
    b.create_light("sun", {"type": "sunlight", "direction": (0.3, 0.3, 0.8),
                           "color": (1.0, 1.0, 0.95), "power": 1.0})
    b.create_camera("cam", {"type": "perspective",
                            "from": (2.0, -2.5, 2.2), "to": (2.0, 2.0, 0.0),
                            "up": (2.0, -2.5, 3.2),
                            "resx": 720, "resy": 720, "fov": 55.0})
    b.create_background({"type": "constant", "color": (0.3, 0.4, 0.6)})
    return b


def main():
    res = int(os.environ.get("PROBE_RES", 320))
    b = big_mesh_builder(res)
    scene = b.compile("cam")
    print("faces:", scene.geom.num_faces, "accel:", scene.accel_kind,
          "blocks:", None if scene.blocks is None else
          (scene.blocks.num_blocks, scene.blocks.block_size))

    from libyafaray_tpu.cameras import shoot_rays
    from libyafaray_tpu.ops.intersect import closest_hit, any_hit

    n = 720 * 720
    yy, xx = np.meshgrid(np.arange(720), np.arange(720), indexing="ij")
    px = jnp.asarray(xx.reshape(-1) + 0.5, jnp.float32)
    py = jnp.asarray(yy.reshape(-1) + 0.5, jnp.float32)
    zeros = jnp.zeros((n,), jnp.float32)
    o, d, valid = jax.jit(lambda s, px, py: shoot_rays(s.camera, px, py,
                                                       zeros, zeros))(
        scene, px, py)

    @jax.jit
    def q_closest(scene, o, d):
        h = closest_hit(scene, o, d, 1e-4, 1e9)
        return h.t, h.prim

    # coherent camera rays
    t, p = q_closest(scene, o, d); t.block_until_ready()
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        t, p = q_closest(scene, o, d)
    t.block_until_ready()
    dt = (time.time() - t0) / reps
    print(f"coherent closest: {n/dt/1e6:.3f} Mrays/s  ({dt*1e3:.1f} ms, "
          f"hit frac {float(jnp.mean(p >= 0)):.3f})")

    # incoherent rays: random origins above terrain, random dirs
    key = jax.random.PRNGKey(0)
    ko, kd = jax.random.split(key)
    oi = jax.random.uniform(ko, (n, 3), minval=jnp.asarray([0., 0., 0.6]),
                            maxval=jnp.asarray([4., 4., 1.5]))
    di = jax.random.normal(kd, (n, 3))
    di = di / jnp.linalg.norm(di, axis=-1, keepdims=True)
    t, p = q_closest(scene, oi, di); t.block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        t, p = q_closest(scene, oi, di)
    t.block_until_ready()
    dt = (time.time() - t0) / reps
    print(f"incoherent closest: {n/dt/1e6:.3f} Mrays/s  ({dt*1e3:.1f} ms)")

    @jax.jit
    def q_any(scene, o, d):
        return any_hit(scene, o, d, 1e-4, 1e9)

    h = q_any(scene, o, d); h.block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        h = q_any(scene, o, d)
    h.block_until_ready()
    dt = (time.time() - t0) / reps
    print(f"coherent any: {n/dt/1e6:.3f} Mrays/s  ({dt*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
