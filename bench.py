"""Benchmark: rays/sec/chip, forward+backward, Cornell path tracing.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures the flagship wavefront path tracer (NEE+MIS, 4 bounces, RR) on the
default backend (real TPU under the driver). Each timed step renders one
full-resolution sample pass AND computes the gradient of the pass's image
mean w.r.t. all material diffuse albedos (fwd+bwd, the BASELINE.json
metric). "Rays" counts camera rays (width*height*spp), the same accounting a
renderer's "samples" use; path vertices per ray are bounces+1.

The reference (libYafaRay) publishes no numbers (BASELINE.md), so the
baseline is MEASURED: a C client against the reference library renders the
same scene with the same integrator settings (BASELINE_MEASURED.json,
350,724 rays/s forward-only on the host CPU); vs_baseline = ours / that.
Note ours additionally includes the backward pass.

Env overrides: BENCH_WIDTH, BENCH_HEIGHT, BENCH_SPP, BENCH_BOUNCES.
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


def main():
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

    # warmup / compile
    r, a, g = fwd_bwd_chunk(scene, *chunks[0], jnp.uint32(0))
    r.block_until_ready()

    t0 = time.time()
    done_rays = 0
    deadline = t0 + float(os.environ.get("BENCH_BUDGET_S", 300))
    for s in range(spp):
        for ch in chunks:
            r, a, g = fwd_bwd_chunk(scene, *ch, jnp.uint32(s))
            done_rays += n_chunk
        r.block_until_ready()
        if time.time() > deadline:
            break
    r.block_until_ready()
    dt = time.time() - t0

    rays_per_sec = done_rays / dt
    base = 1.0
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BASELINE_MEASURED.json")) as fh:
            base = float(json.load(fh)["baseline_rays_per_sec"])
    except Exception:
        pass
    print(json.dumps({
        "metric": f"camera rays/sec/chip fwd+bwd, cornell path tracing "
                  f"{width}x{height} {bounces}b (of {spp}spp target); "
                  "baseline = measured reference CPU fwd-only rays/s",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / base, 2),
    }))


if __name__ == "__main__":
    main()
