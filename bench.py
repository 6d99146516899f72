"""Benchmark: rays/sec/chip across the BASELINE.md configs.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Headline (value/vs_baseline): the flagship wavefront path tracer on the
Cornell box (NEE+MIS, 4 bounces, RR) — each timed step renders one
full-resolution sample pass AND computes the gradient of the pass's image
mean w.r.t. all material diffuse albedos (fwd+bwd, the BASELINE.json
metric). "Rays" counts camera rays (width*height*spp).

`extra` carries the remaining BASELINE.md configs measured fwd-only
through the public render() loop on the same chip:
  - bigmesh: config 3 — ~200k-tri textured terrain + env background
    (the large-scene traversal regime; exercises the tile-wavefront
    Pallas kernel in accel/tiles.py), with per-kernel device-time
    attribution from the profiler.
  - glossy: config 2 — Cornell + glossy box, 4-bounce PT.
  - volume: config 5 — homogeneous scattering volume + emissive mesh.

The reference (libYafaRay) publishes no numbers (BASELINE.md), so the
baseline is MEASURED: a C client against the reference library renders the
Cornell scene with the same integrator settings (BASELINE_MEASURED.json,
350,724 rays/s forward-only on the host CPU); vs_baseline = ours / that.
Note ours additionally includes the backward pass.

Env overrides: BENCH_WIDTH/HEIGHT/SPP/BOUNCES, BENCH_BUDGET_S (per-config
time cap), BENCH_MESH_RES, BENCH_CONFIGS (comma list, default all).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tests"))

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: the remote-compile tunnel can take minutes per
# executable; cached across runs they load in seconds
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def bench_cornell_fwd_bwd(budget_s: float):
    """Headline: fwd+bwd rays/s on the Cornell PT scene."""
    from libyafaray_tpu import make_integrator
    from libyafaray_tpu.cameras import shoot_rays
    from libyafaray_tpu.integrators.mc import integrate
    from libyafaray_tpu import sampler
    from scenes import cornell_builder

    width = int(os.environ.get("BENCH_WIDTH", 1920))
    height = int(os.environ.get("BENCH_HEIGHT", 1080))
    spp = int(os.environ.get("BENCH_SPP", 16))
    bounces = int(os.environ.get("BENCH_BOUNCES", 4))
    rows_per_chunk = int(os.environ.get("BENCH_CHUNK_ROWS", 135))

    b = cornell_builder()
    b.cameras["cam"]["resx"] = width
    b.cameras["cam"]["resy"] = height
    scene = b.compile("cam")  # brute-force accel: dense VPU/MXU work
    cfg = make_integrator({"type": "pathtracing", "bounces": bounces})

    n_chunk = rows_per_chunk * width

    def chunk_loss(diffuse_color, scene, px, py, pid, sidx):
        sc = scene.replace(
            materials=scene.materials.replace(diffuse_color=diffuse_color))
        lu = sampler.rand1(pid, sidx, 0, 777)
        lv = sampler.rand1(pid, sidx, 0, 778)
        o, d, valid = shoot_rays(sc.camera, px, py, lu, lv)
        rgb, alpha, _ = integrate(sc, cfg, o, d, valid, pid, sidx)
        return jnp.mean(rgb), (rgb, alpha)

    @jax.jit
    def fwd_bwd_chunk(scene, px, py, pid, sidx):
        (loss, (rgb, alpha)), g = jax.value_and_grad(
            chunk_loss, has_aux=True)(scene.materials.diffuse_color, scene,
                                      px, py, pid, sidx)
        return rgb, alpha, g

    yy, xx = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    pid_all = (yy * width + xx).reshape(-1).astype(np.uint32)
    px_all = (xx.reshape(-1) + 0.5).astype(np.float32)
    py_all = (yy.reshape(-1) + 0.5).astype(np.float32)
    n_pix = width * height
    chunks = []
    for c0 in range(0, n_pix, n_chunk):
        c1 = min(c0 + n_chunk, n_pix)
        if c1 - c0 < n_chunk:  # pad to a single static shape
            pad = n_chunk - (c1 - c0)
            sl = np.r_[np.arange(c0, c1), np.full(pad, c0)]
        else:
            sl = np.arange(c0, c1)
        chunks.append((jnp.asarray(px_all[sl]), jnp.asarray(py_all[sl]),
                       jnp.asarray(pid_all[sl])))

    r, a, g = fwd_bwd_chunk(scene, *chunks[0], jnp.uint32(0))
    r.block_until_ready()

    t0 = time.time()
    done_rays = 0
    deadline = t0 + budget_s
    for s in range(spp):
        for ch in chunks:
            r, a, g = fwd_bwd_chunk(scene, *ch, jnp.uint32(s))
            done_rays += n_chunk
        r.block_until_ready()
        if time.time() > deadline:
            break
    r.block_until_ready()
    dt = time.time() - t0
    return done_rays / dt, dict(width=width, height=height, bounces=bounces)


def bench_caustic_grad(budget_s: float):
    """BASELINE.md config 4: glass-in-Cornell caustic scene, fwd+bwd rays/s
    with gradients flowing to the glass IOR and a floor albedo texture's
    texel pool (through uv + bilinear sampling)."""
    from libyafaray_tpu import make_integrator
    from libyafaray_tpu.cameras import shoot_rays
    from libyafaray_tpu.integrators.mc import integrate
    from libyafaray_tpu import sampler
    from scenes import caustic_grad_builder

    width = height = int(os.environ.get("BENCH_CAUSTIC_RES", 512))
    bounces = 5
    scene = caustic_grad_builder(width, height).compile("cam")
    cfg = make_integrator({"type": "pathtracing", "bounces": bounces})
    n = width * height

    def loss_fn(theta, scene, px, py, pid, sidx):
        ior, texels = theta
        sc = scene.replace(
            materials=scene.materials.replace(ior=ior),
            textures=scene.textures.replace(texel_pool=texels))
        lu = sampler.rand1(pid, sidx, 0, 777)
        lv = sampler.rand1(pid, sidx, 0, 778)
        o, d, valid = shoot_rays(sc.camera, px, py, lu, lv)
        rgb, alpha, _ = integrate(sc, cfg, o, d, valid, pid, sidx)
        return jnp.mean(rgb)

    @jax.jit
    def fwd_bwd(scene, px, py, pid, sidx):
        theta = (scene.materials.ior, scene.textures.texel_pool)
        loss, g = jax.value_and_grad(loss_fn)(theta, scene, px, py, pid,
                                              sidx)
        return loss, g

    yy, xx = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    pid = jnp.asarray((yy * width + xx).reshape(-1).astype(np.uint32))
    px = jnp.asarray((xx.reshape(-1) + 0.5).astype(np.float32))
    py = jnp.asarray((yy.reshape(-1) + 0.5).astype(np.float32))

    loss, g = fwd_bwd(scene, px, py, pid, jnp.uint32(0))
    loss.block_until_ready()
    g_ior = float(jnp.abs(g[0]).sum())
    g_tex = float(jnp.abs(g[1]).sum())

    t0 = time.time()
    deadline = t0 + budget_s
    done = 0
    s = 1
    while True:
        loss, g = fwd_bwd(scene, px, py, pid, jnp.uint32(s))
        done += n
        s += 1
        if s % 2 == 0:
            loss.block_until_ready()
            if time.time() > deadline or s > 32:
                break
    loss.block_until_ready()
    dt = time.time() - t0
    return done / dt, dict(res=f"{width}x{height}", bounces=bounces,
                           grad_ior_l1=round(g_ior, 6),
                           grad_texel_l1=round(g_tex, 6))


def _bench_render(builder, cfg_pm, budget_s: float, spp_target: int = 8,
                  profile: bool = False):
    """Forward rays/s through the public render() loop (film scatter-add,
    adaptive mask off). Returns (rays_per_sec, extras)."""
    from libyafaray_tpu import make_integrator, film as F
    from libyafaray_tpu.render import _render_pass_jit

    scene = builder.compile("cam")
    cfg = make_integrator(cfg_pm)
    w = scene.camera.resx
    h = scene.camera.resy
    film = F.make_film(w, h)
    # warmup/compile
    film = _render_pass_jit(scene, cfg, film, jnp.uint32(0), None)
    film.weights.block_until_ready()
    t0 = time.time()
    deadline = t0 + budget_s
    passes = 0
    for s in range(1, spp_target + 1):
        film = _render_pass_jit(scene, cfg, film, jnp.uint32(s), None)
        passes += 1
        if s % 2 == 0:
            film.weights.block_until_ready()
            if time.time() > deadline:
                break
    film.weights.block_until_ready()
    dt = time.time() - t0
    extras = {"res": f"{w}x{h}", "passes": passes}
    if profile:
        try:
            import shutil
            from libyafaray_tpu.utils.profiling import device_op_summary
            tdir = "/tmp/yaf_bench_trace"
            shutil.rmtree(tdir, ignore_errors=True)
            with jax.profiler.trace(tdir):
                film = _render_pass_jit(scene, cfg, film, jnp.uint32(999),
                                        None)
                film.weights.block_until_ready()
            ops = device_op_summary(tdir, top=6)
            extras["top_device_ops_ms"] = [
                [name[:60], round(ms, 2)] for name, ms, _ in ops[:6]]
        except Exception as exc:  # profiling must never fail the bench
            extras["profile_error"] = str(exc)[:200]
    return passes * w * h / dt, extras


def main():
    budget = float(os.environ.get("BENCH_BUDGET_S", 150))
    configs = os.environ.get("BENCH_CONFIGS",
                             "cornell,bigmesh,glossy,caustic,volume"
                             ).split(",")
    extra = {}

    rays_per_sec = 0.0
    if "cornell" in configs:
        rays_per_sec, info = bench_cornell_fwd_bwd(budget)
        extra["cornell_fwd_bwd"] = {"rays_per_sec": round(rays_per_sec, 1),
                                    **info}

    if "bigmesh" in configs:
        try:
            from scenes import bigmesh_builder
            res = int(os.environ.get("BENCH_MESH_RES", 320))
            rps, info = _bench_render(
                bigmesh_builder(res),
                {"type": "pathtracing", "bounces": 2},
                budget, spp_target=6, profile=True)
            ntris = 2 * (res - 1) * (res - 1)
            extra["bigmesh_203k"] = {"rays_per_sec": round(rps, 1),
                                     "triangles": ntris, **info}
        except Exception as exc:
            extra["bigmesh_203k"] = {"error": str(exc)[:300]}
        if os.environ.get("BENCH_LBVH", "1") != "0":
            # same scene through the Karras LBVH (non-default accel), for
            # the blocks-vs-LBVH perf record; isolated so a failure here
            # never loses the production-path number
            try:
                from scenes import bigmesh_builder
                b_bvh = bigmesh_builder(res)
                b_bvh.set_render_params({"scene_accelerator": "bvh"})
                rps_bvh, _ = _bench_render(
                    b_bvh, {"type": "pathtracing", "bounces": 2},
                    min(budget, 45), spp_target=4)
                extra.setdefault("bigmesh_203k", {})[
                    "lbvh_rays_per_sec"] = round(rps_bvh, 1)
            except Exception as exc:
                extra.setdefault("bigmesh_203k", {})[
                    "lbvh_error"] = str(exc)[:200]

    if "glossy" in configs:
        try:
            from scenes import glossy_cornell_builder
            b = glossy_cornell_builder()
            b.cameras["cam"]["resx"] = 512
            b.cameras["cam"]["resy"] = 512
            rps, info = _bench_render(
                b, {"type": "pathtracing", "bounces": 4}, budget,
                spp_target=16)
            extra["glossy_cornell"] = {"rays_per_sec": round(rps, 1), **info}
        except Exception as exc:
            extra["glossy_cornell"] = {"error": str(exc)[:300]}

    if "caustic" in configs:
        # BASELINE.md config 4: dielectric caustic paths; fwd+bwd with
        # gradients w.r.t. IOR and the albedo texture texel pool
        try:
            rps, info = bench_caustic_grad(budget)
            extra["caustic_grad"] = {"rays_per_sec": round(rps, 1), **info}
        except Exception as exc:
            extra["caustic_grad"] = {"error": str(exc)[:300]}

    if "volume" in configs:
        try:
            from scenes import volume_emissive_builder
            b = volume_emissive_builder()
            b.cameras["cam"]["resx"] = 512
            b.cameras["cam"]["resy"] = 512
            rps, info = _bench_render(
                b, {"type": "pathtracing", "bounces": 3}, budget,
                spp_target=8)
            extra["volume_emissive"] = {"rays_per_sec": round(rps, 1), **info}
        except Exception as exc:
            extra["volume_emissive"] = {"error": str(exc)[:300]}

    base = 1.0
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BASELINE_MEASURED.json")) as fh:
            base = float(json.load(fh)["baseline_rays_per_sec"])
    except Exception:
        pass
    print(json.dumps({
        "metric": "camera rays/sec/chip fwd+bwd, cornell path tracing "
                  "1920x1080 4b; baseline = measured reference CPU "
                  "fwd-only rays/s; extra: fwd-only rays/s for BASELINE.md "
                  "configs 2 (glossy), 3 (203k-tri mesh + env), 5 (volume + "
                  "emissive mesh) with per-kernel attribution, and fwd+bwd "
                  "rays/s for config 4 (caustic + IOR/texel gradients)",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / base, 2),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
