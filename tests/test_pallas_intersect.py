"""Pallas fused Möller-Trumbore kernel vs the brute-force scan oracle.

Runs the kernel in interpret mode so the test works on the CPU test
backend; on TPU hardware the same kernel is the compiled production path
(ops/intersect.py dispatches to it for scenes <= PALLAS_MAX_TRIS).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libyafaray_tpu.accel.pallas_intersect import mt_closest, pack_tris
from libyafaray_tpu.ops import intersect as I
from libyafaray_tpu.scene_types import Geometry


def _random_geom(rng, f, motion=False):
    vtx = rng.standard_normal((f * 3, 3)).astype(np.float32)
    faces = np.arange(f * 3, dtype=np.int32).reshape(f, 3)
    vis = np.full(f, 3, np.int32)
    vis[::7] = 2   # camera-invisible
    vis[::11] = 1  # casts no shadow
    z = jnp.zeros
    return Geometry(
        vertices=jnp.asarray(vtx), normals=jnp.asarray(vtx),
        uvs=z((1, 2)), faces=jnp.asarray(faces),
        face_uvs=z((f, 3), jnp.int32), face_mat=z(f, jnp.int32),
        face_obj=z(f, jnp.int32), face_smooth=z(f, bool),
        face_light=jnp.full(f, -1, jnp.int32),
        sph_center=z((0, 3)), sph_radius=z(0), sph_mat=z(0, jnp.int32),
        sph_obj=z(0, jnp.int32), sph_light=z(0, jnp.int32),
        obj_visibility=z(1, jnp.int32), face_vis=jnp.asarray(vis),
        sph_vis=z(0, jnp.int32),
        vertices_t1=(jnp.asarray(
            vtx + rng.standard_normal(vtx.shape).astype(np.float32) * 0.3)
            if motion else None),
        num_faces=f, num_spheres=0, has_motion=motion)


def _rays(rng, n):
    o = rng.standard_normal((n, 3)).astype(np.float32) * 2
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("shadow", [False, True])
def test_kernel_matches_scan_oracle(rng, shadow, monkeypatch):
    f, n = 300, 2048
    geom = _random_geom(rng, f)
    o, d = _rays(rng, n)
    t_min = jnp.full(n, 1e-4)
    t_max = jnp.full(n, 1e30)
    excl = jnp.full(n, -1, jnp.int32).at[::5].set(7)

    monkeypatch.setattr(I, "_pallas_ok", lambda g: False)
    ref = I._brute_closest(geom, o, d, t_min, t_max, excl, shadow=shadow)

    v0 = geom.vertices[geom.faces[:, 0]]
    v1 = geom.vertices[geom.faces[:, 1]]
    v2 = geom.vertices[geom.faces[:, 2]]
    tris = pack_tris(v0, v1, v2, geom.face_vis)
    bt, bp, bu, bv = mt_closest(tris, o, d, t_min, t_max, excl,
                                shadow=shadow, interpret=True)

    valid = np.asarray(bp >= 0)
    np.testing.assert_array_equal(valid, np.asarray(ref.valid))
    np.testing.assert_allclose(np.asarray(bt)[valid],
                               np.asarray(ref.t)[valid], rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(bp)[valid],
                                  np.asarray(ref.prim)[valid])
    np.testing.assert_allclose(
        np.stack([np.asarray(bu), np.asarray(bv)], -1)[valid],
        np.asarray(ref.uv)[valid], rtol=1e-4, atol=1e-5)


def test_kernel_tie_break_is_self_consistent(monkeypatch):
    """Ray hitting the exact shared edge of two triangles: the kernel must
    return the LOWEST prim id among the tied winners with u/v taken from that
    same triangle (matching the scan oracle's argmin), not a mix (ADVICE r1).
    """
    # two triangles in the z=1 plane sharing the edge x=0, y in [-1,1]
    v0 = jnp.asarray([[0.0, -1.0, 1.0], [0.0, -1.0, 1.0]], jnp.float32)
    v1 = jnp.asarray([[0.0, 1.0, 1.0], [1.0, -1.0, 1.0]], jnp.float32)
    v2 = jnp.asarray([[-1.0, -1.0, 1.0], [0.0, 1.0, 1.0]], jnp.float32)
    vis = jnp.asarray([3, 3], jnp.int32)
    tris = pack_tris(v0, v1, v2, vis)
    o = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    t_min = jnp.asarray([1e-4], jnp.float32)
    t_max = jnp.asarray([1e30], jnp.float32)
    excl = jnp.asarray([-1], jnp.int32)
    bt, bp, bu, bv = mt_closest(tris, o, d, t_min, t_max, excl,
                                interpret=True)
    assert int(bp[0]) == 0          # lowest index among the tie
    np.testing.assert_allclose(float(bt[0]), 1.0, rtol=1e-6)
    # barycentrics must belong to triangle 0: hit point (0,0,1) in tri 0 has
    # u (towards v1=(0,1,1)) = 0.5, v (towards v2=(-1,-1,1)) = 0.
    np.testing.assert_allclose(float(bu[0]), 0.5, atol=1e-6)
    np.testing.assert_allclose(float(bv[0]), 0.0, atol=1e-6)


_TPU_SMOKE = r"""
import numpy as np
import jax, jax.numpy as jnp
if jax.default_backend() not in ("tpu", "axon"):
    print("NO_TPU"); raise SystemExit(0)
from libyafaray_tpu.accel.pallas_intersect import mt_closest, pack_tris, use_pallas
rng = np.random.default_rng(7)
f, n = 300, 1024
vtx = rng.standard_normal((f * 3, 3)).astype(np.float32)
v0, v1, v2 = vtx[0::3], vtx[1::3], vtx[2::3]
vis = np.full(f, 3, np.int32)
tris = pack_tris(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                 jnp.asarray(vis))
o = rng.standard_normal((n, 3)).astype(np.float32) * 2
d = rng.standard_normal((n, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
t_min = jnp.full(n, 1e-4); t_max = jnp.full(n, 1e30)
excl = jnp.full(n, -1, jnp.int32)
bt, bp, bu, bv = mt_closest(tris, jnp.asarray(o), jnp.asarray(d),
                            t_min, t_max, excl)                # compiled
rt, rp, ru, rv = mt_closest(tris, jnp.asarray(o), jnp.asarray(d),
                            t_min, t_max, excl, interpret=True)  # oracle
valid = np.asarray(bp >= 0)
assert use_pallas(), "probe rejected the compiled kernel"
np.testing.assert_array_equal(valid, np.asarray(rp >= 0))
np.testing.assert_array_equal(np.asarray(bp)[valid], np.asarray(rp)[valid])
np.testing.assert_allclose(np.asarray(bt)[valid], np.asarray(rt)[valid],
                           rtol=1e-5, atol=1e-5)
print("TPU_OK", int(valid.sum()))
"""


def test_compiled_kernel_on_tpu_smoke():
    """Run the COMPILED (non-interpret) kernel on real TPU hardware in a
    subprocess free of the conftest CPU forcing; skip when no TPU is
    attached (ADVICE r1, medium: the Mosaic-compiled path must be exercised,
    not only interpret mode)."""
    import os
    import subprocess
    import sys
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p])
    res = subprocess.run([sys.executable, "-c", _TPU_SMOKE], env=env,
                         capture_output=True, text=True, timeout=600)
    out = res.stdout + res.stderr
    if "NO_TPU" in res.stdout:
        pytest.skip("no TPU backend attached")
    assert res.returncode == 0, out
    assert "TPU_OK" in res.stdout, out


def test_kernel_motion_blur_matches_scan(rng, monkeypatch):
    f, n = 200, 1024
    geom = _random_geom(rng, f, motion=True)
    o, d = _rays(rng, n)
    t_min = jnp.full(n, 1e-4)
    t_max = jnp.full(n, 1e30)
    excl = jnp.full(n, -1, jnp.int32)
    time = jnp.asarray(rng.random(n).astype(np.float32))

    monkeypatch.setattr(I, "_pallas_ok", lambda g: False)
    ref = I._brute_closest(geom, o, d, t_min, t_max, excl, time=time)

    fc = geom.faces
    tris = pack_tris(geom.vertices[fc[:, 0]], geom.vertices[fc[:, 1]],
                     geom.vertices[fc[:, 2]], geom.face_vis)
    vb = geom.vertices_t1
    tris1 = pack_tris(vb[fc[:, 0]], vb[fc[:, 1]], vb[fc[:, 2]],
                      geom.face_vis)
    bt, bp, bu, bv = mt_closest(tris, o, d, t_min, t_max, excl,
                                time=time, tris_t1=tris1, interpret=True)
    valid = np.asarray(bp >= 0)
    np.testing.assert_array_equal(valid, np.asarray(ref.valid))
    np.testing.assert_allclose(np.asarray(bt)[valid],
                               np.asarray(ref.t)[valid], rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(bp)[valid],
                                  np.asarray(ref.prim)[valid])
