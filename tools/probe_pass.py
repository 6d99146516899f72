"""Op-level attribution of one bigmesh render pass on TPU."""
import sys, os, shutil, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from libyafaray_tpu import make_integrator, film as F
from libyafaray_tpu.render import _render_pass_jit
from libyafaray_tpu.utils.profiling import device_op_summary
from scenes import bigmesh_builder

b = bigmesh_builder(320)
b.cameras["cam"]["resx"] = 720
b.cameras["cam"]["resy"] = 720
scene = b.compile("cam")
cfg = make_integrator({"type": "pathtracing", "bounces": 2})
film = F.make_film(720, 720)
film = _render_pass_jit(scene, cfg, film, jnp.uint32(0), None)
film.weights.block_until_ready()
t0 = time.time()
film = _render_pass_jit(scene, cfg, film, jnp.uint32(1), None)
film.weights.block_until_ready()
print(f"pass time {time.time()-t0:.3f}s")
tdir = "/tmp/yaf_pass_trace"
shutil.rmtree(tdir, ignore_errors=True)
with jax.profiler.trace(tdir):
    film = _render_pass_jit(scene, cfg, film, jnp.uint32(2), None)
    film.weights.block_until_ready()
for name, ms, cnt in device_op_summary(tdir, top=40):
    print(f"{ms:9.2f} ms  x{cnt:4d}  {name[:90]}")
