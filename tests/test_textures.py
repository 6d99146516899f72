"""Texture / shader-node / volume subsystem tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libyafaray_tpu import SceneBuilder, film as F, make_integrator
from libyafaray_tpu.render import render
from libyafaray_tpu.textures import noise
from scenes import cornell_builder


def test_perlin_range_and_determinism(rng):
    p = jnp.asarray(rng.uniform(-10, 10, (4096, 3)), jnp.float32)
    n1 = np.asarray(noise.perlin(p))
    n2 = np.asarray(noise.perlin(p))
    assert np.array_equal(n1, n2)
    assert n1.min() >= 0.0 and n1.max() <= 1.0
    assert n1.std() > 0.05, "perlin should vary"
    # smooth: nearby points nearly equal
    d = np.asarray(noise.perlin(p + 1e-4)) - n1
    assert np.abs(d).max() < 0.01


def test_voronoi_distances_ordered(rng):
    p = jnp.asarray(rng.uniform(0, 8, (1024, 3)), jnp.float32)
    f1, f2, f3, f4 = noise.voronoi_f(p)
    f1, f2, f3, f4 = map(np.asarray, (f1, f2, f3, f4))
    assert (f1 <= f2 + 1e-6).all() and (f2 <= f3 + 1e-6).all() \
        and (f3 <= f4 + 1e-6).all()
    assert f1.max() < 2.0  # nearest feature point is within ~cell distance


def _tex_scene(tex_pm, image=None):
    b = cornell_builder()
    b.create_texture("t", tex_pm, image=image)
    b.create_material("tm", {"type": "shinydiffusemat",
                             "diffuse_shader": "map"},
                      node_list=[{"type": "texture_mapper", "name": "map",
                                  "texture": "t",
                                  "texco": tex_pm.get("texco", "global")}])
    return b


@pytest.mark.parametrize("pm", [
    {"type": "clouds", "size": 2.0, "depth": 2},
    {"type": "marble", "size": 2.0, "depth": 2, "turbulence": 3.0},
    {"type": "wood", "size": 1.0, "wood_type": "rings"},
    {"type": "voronoi", "size": 0.5},
    {"type": "musgrave", "musgrave_type": "fBm"},
    {"type": "distorted_noise", "distort": 2.0},
    {"type": "rgb_cube"},
    {"type": "blend", "stype": "sphere"},
])
def test_procedural_textures_evaluate(pm):
    from libyafaray_tpu.textures import sample_texture
    b = _tex_scene(pm)
    scene = b.compile("cam")
    p = jnp.asarray(np.random.default_rng(1).uniform(-2, 2, (512, 3)),
                    jnp.float32)
    tid = jnp.zeros((512,), jnp.int32)
    col = np.asarray(jax.jit(
        lambda: sample_texture(scene, tid, p, p[..., :2]))())
    assert np.isfinite(col).all()
    assert col[..., :3].std() > 1e-3, f"{pm['type']} should vary spatially"


def test_image_texture_bilinear_center_exact():
    from libyafaray_tpu.textures import sample_texture
    img = np.zeros((2, 2, 3), np.float32)
    img[0, 0] = (1, 0, 0)   # top-left texel
    img[1, 1] = (0, 1, 0)
    b = _tex_scene({"type": "image", "interpolate": "bilinear",
                    "texco": "uv"}, image=img)
    scene = b.compile("cam")
    # uv (0.25, 0.75) = texel center of top-left (v up: row 0 is top)
    uv = jnp.asarray([[0.25, 0.75], [0.75, 0.25]], jnp.float32)
    p = jnp.zeros((2, 3), jnp.float32)
    col = np.asarray(sample_texture(scene, jnp.zeros(2, jnp.int32), p, uv))
    np.testing.assert_allclose(col[0, :3], (1, 0, 0), atol=1e-5)
    np.testing.assert_allclose(col[1, :3], (0, 1, 0), atol=1e-5)


def test_color_ramp():
    from libyafaray_tpu.textures import sample_texture
    b = _tex_scene({"type": "blend", "stype": "lin", "use_color_ramp": True,
                    "ramp_items": [
                        {"position": 0.0, "color": (1, 0, 0, 1)},
                        {"position": 1.0, "color": (0, 0, 1, 1)}]})
    scene = b.compile("cam")
    # blend lin intensity = (1+x)/2: x=-1 -> 0 (red), x=1 -> 1 (blue)
    p = jnp.asarray([[-1, 0, 0], [1, 0, 0], [0, 0, 0]], jnp.float32)
    col = np.asarray(sample_texture(scene, jnp.zeros(3, jnp.int32), p,
                                    p[..., :2]))
    np.testing.assert_allclose(col[0, :3], (1, 0, 0), atol=1e-4)
    np.testing.assert_allclose(col[1, :3], (0, 0, 1), atol=1e-4)
    np.testing.assert_allclose(col[2, :3], (0.5, 0, 0.5), atol=1e-4)


def test_node_mix_modes():
    from libyafaray_tpu.materials.node_eval import _blend
    a = jnp.asarray([0.25])
    b_ = jnp.asarray([0.5])
    f = jnp.asarray([1.0])
    assert float(_blend(0, a, b_, f)[0]) == pytest.approx(0.25)   # mix
    assert float(_blend(1, a, b_, f)[0]) == pytest.approx(0.75)   # add
    assert float(_blend(2, a, b_, f)[0]) == pytest.approx(0.125)  # mult
    assert float(_blend(3, a, b_, f)[0]) == pytest.approx(0.25)   # sub
    assert float(_blend(8, a, b_, f)[0]) == pytest.approx(0.5)    # lighten


def test_uniform_volume_transmittance_analytic():
    from libyafaray_tpu.integrators.volume import transmittance
    b = cornell_builder()
    b.create_volume_region("fog", {
        "type": "UniformVolume", "sigma_a": 0.3, "sigma_s": 0.2,
        "minX": 0, "minY": 0, "minZ": 0, "maxX": 1, "maxY": 1, "maxZ": 1})
    scene = b.compile("cam")
    o = jnp.asarray([[0.5, -0.5, 0.5]], jnp.float32)
    d = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    t_hit = jnp.asarray([1.5], jnp.float32)  # crosses the unit fog box fully
    tr = np.asarray(transmittance(scene, o, d, t_hit, steps=32))
    expected = np.exp(-(0.3 + 0.2) * 1.0)
    np.testing.assert_allclose(tr[0], expected, rtol=1e-3)


def test_volume_scatter_renders_finite():
    b = cornell_builder()
    b.create_volume_region("fog", {
        "type": "UniformVolume", "sigma_a": 0.05, "sigma_s": 0.3,
        "minX": 0, "minY": 0, "minZ": 0, "maxX": 1, "maxY": 1, "maxZ": 1})
    scene = b.compile("cam")
    cfg = make_integrator({"type": "pathtracing", "bounces": 2})
    film = render(scene, cfg, 16, 16, spp=2)
    img = np.asarray(F.resolve(film, "combined"))
    assert np.isfinite(img).all()
    assert img[..., :3].mean() > 0.001


def test_bump_mapping_changes_shading():
    b = cornell_builder()
    b.create_texture("bumptex", {"type": "clouds", "size": 0.2, "depth": 2})
    b.create_material("bumpmat", {"type": "shinydiffusemat",
                                  "color": (0.7, 0.7, 0.7),
                                  "bump_shader": "bmap"},
                      node_list=[{"type": "texture_mapper", "name": "bmap",
                                  "texture": "bumptex", "texco": "global",
                                  "bump_strength": 5.0}])
    b.objects["box2"].faces = [
        (a, bb, c, ua, ub, uc, 3)
        for (a, bb, c, ua, ub, uc, m) in b.objects["box2"].faces]
    scene = b.compile("cam")
    cfg = make_integrator({"type": "pathtracing", "bounces": 2})
    img_b = np.asarray(F.resolve(render(scene, cfg, 32, 32, spp=2), "combined"))
    base = cornell_builder()
    img_0 = np.asarray(F.resolve(render(base.compile("cam"), cfg, 32, 32,
                                        spp=2), "combined"))
    assert np.isfinite(img_b).all()
    assert np.abs(img_b - img_0).max() > 1e-3, "bump should alter the image"
