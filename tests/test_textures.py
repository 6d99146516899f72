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


def test_ewa_anisotropic_filtering():
    """EWA (texture_image.cc:345-443, 'mipmap_ewa'): with an anisotropic
    screen footprint, EWA filters only along the major axis while
    trilinear over-blurs by the major-axis LOD."""
    import jax.numpy as jnp
    from libyafaray_tpu.textures.image import sample_image
    from scenes import cornell_builder
    b = cornell_builder()
    stripes = (np.indices((64, 64))[1] % 8 < 4).astype(np.float32)
    img = np.repeat(stripes[..., None], 3, -1)
    b.create_texture("s", {"type": "image", "interpolate": "mipmap_ewa"},
                     image=img)
    pool = b.compile("cam").textures
    uv = jnp.array([[0.532, 0.41]] * 2)   # inside a white stripe
    tid = jnp.zeros((2,), jnp.int32)
    dx = jnp.array([[0.01, 0.0]] * 2)     # sharp in u
    dy = jnp.array([[0.0, 0.4]] * 2)      # 25 texels in v
    ewa = float(sample_image(pool, tid, uv, None, dx, dy)[0, 0])
    tri = float(sample_image(
        pool.replace(interp=jnp.full_like(pool.interp, 3)),
        tid, uv, None, dx, dy)[0, 0])
    assert ewa > 0.9, f"EWA lost detail across the minor axis: {ewa}"
    assert tri < 0.7, f"trilinear should blur to the stripe mean: {tri}"
    # isotropic footprint: both converge to the local mean
    diso = jnp.full((2, 2), 0.2)
    e_iso = float(sample_image(pool, tid, uv, None, diso, diso)[0, 0])
    assert abs(e_iso - 0.5) < 0.2


def test_primary_hit_mipmap_reduces_aliasing():
    """Full-pipeline check: screen-space uv differentials (SurfacePoint
    differential analogue) reach the image sampler through the shader-node
    chain and change the render vs raw bilinear."""
    from libyafaray_tpu import make_integrator, film as F
    from libyafaray_tpu.render import render
    from scenes import cornell_builder

    def build(interp):
        b = cornell_builder()
        cell = np.indices((64, 64)).sum(0) % 2
        img = np.repeat(cell[..., None], 3, -1).astype(np.float32)
        b.create_texture("check", {"type": "image", "interpolate": interp},
                         image=img)
        b.create_material("floor", {"type": "shinydiffusemat",
                                    "color": (1, 1, 1),
                                    "diffuse_shader": "d"},
                          node_list=[{"element": "shader_node", "name": "d",
                                      "type": "texture_mapper",
                                      "texco": "uv", "texture": "check"}])
        b.create_object("floor2")
        b.set_current_material("floor")
        i0 = b.add_vertex(0, 0, 0.001); i1 = b.add_vertex(1, 0, 0.001)
        i2 = b.add_vertex(1, 1, 0.001); i3 = b.add_vertex(0, 1, 0.001)
        u0 = b.add_uv(0, 0); u1 = b.add_uv(8, 0)
        u2 = b.add_uv(8, 8); u3 = b.add_uv(0, 8)
        b.add_quad(i0, i1, i2, i3, uv=(u0, u1, u2, u3))
        b.cameras["cam"]["resx"] = 32
        b.cameras["cam"]["resy"] = 32
        return b.compile("cam")

    cfg = make_integrator({"type": "directlighting"})
    bi = np.asarray(F.resolve(render(build("bilinear"), cfg, spp=2),
                              "combined"))
    tri = np.asarray(F.resolve(render(build("mipmap_trilinear"), cfg, spp=2),
                               "combined"))
    assert np.abs(bi - tri).max() > 0.01, "mip path did not engage"
    # filtered floor shows lower variance (less aliasing) at distance
    assert tri[24:32, :, :3].var() < bi[24:32, :, :3].var()


def test_volume_attenuation_grid_matches_direct_march():
    """SingleScatter 'optimize' grid (integrator_single_scatter.cc:35-108):
    the cached per-light attenuation lookup matches the direct march."""
    from libyafaray_tpu import make_integrator, film as F
    from libyafaray_tpu.render import render
    from scenes import cornell_builder

    def build():
        b = cornell_builder(light_kind="point")
        b.create_volume_region("fog", {
            "type": "UniformVolume", "sigma_s": 0.6, "sigma_a": 0.1,
            "minX": 0.1, "minY": 0.1, "minZ": 0.1,
            "maxX": 0.9, "maxY": 0.9, "maxZ": 0.9})
        b.cameras["cam"]["resx"] = 16
        b.cameras["cam"]["resy"] = 16
        return b.compile("cam")

    direct = make_integrator({"type": "directlighting", "optimize": False})
    cached = make_integrator({"type": "directlighting", "optimize": True})
    i_d = np.asarray(F.resolve(render(build(), direct, spp=2), "combined"))
    i_c = np.asarray(F.resolve(render(build(), cached, spp=2), "combined"))
    assert np.isfinite(i_d).all() and np.isfinite(i_c).all()
    # grid is an interpolated cache: close but not bit-equal
    assert np.abs(i_d - i_c).max() < 0.05
    assert np.abs(i_d - i_c).max() > 0.0  # actually took the cached path


def test_image_optimization_levels():
    """image_optimization (reference include/image/image.h:47-48): the
    texel pool is stored f32 ("none", default), f16 ("optimized"), or
    u8-quantized with per-texture HDR scale ("compressed"); sampled values
    stay within quantization error of the unoptimized pool."""
    import jax.numpy as jnp
    from libyafaray_tpu.textures import sample_texture
    from libyafaray_tpu.textures.build import build_pool

    rng = np.random.default_rng(5)
    img = (rng.random((16, 16, 4)).astype(np.float32) * 3.0)  # HDR range
    img[..., 3] = 1.0

    def pool_for(opt):
        b = SceneBuilder()
        b.create_texture("t", {"type": "image", "interpolate": "bilinear",
                               "image_optimization": opt}, image=img)
        return build_pool(b)

    p_none = pool_for("none")
    p_opt = pool_for("optimized")
    p_cmp = pool_for("compressed")
    assert p_none.texel_pool.dtype == jnp.float32
    assert p_opt.texel_pool.dtype == jnp.float16
    assert p_cmp.texel_pool.dtype == jnp.uint8

    uv = jnp.asarray(rng.random((64, 2)).astype(np.float32))
    tid = jnp.zeros((64,), jnp.int32)
    from libyafaray_tpu.textures.image import sample_image
    ref = np.asarray(sample_image(p_none, tid, uv))
    got_o = np.asarray(sample_image(p_opt, tid, uv))
    got_c = np.asarray(sample_image(p_cmp, tid, uv))
    np.testing.assert_allclose(got_o, ref, atol=2e-3)     # f16 mantissa
    np.testing.assert_allclose(got_c, ref, atol=3.5 / 255.0 * 3.0)  # u8 + scale 3


def test_color_ramp_hsl_true_interpolation():
    """HSL ramp mode does TRUE HSL interpolation (color_ramp.cc:97-110),
    not the HSV approximation of earlier rounds: red->white interpolates
    through l=0.75 (muted pink), while HSV would pass through v=1
    (bright pink) — distinguishable at the midpoint. Endpoints
    round-trip exactly."""
    from libyafaray_tpu.textures import sample_texture
    from libyafaray_tpu.textures.eval import (_rgb_to_hsl, _hsl_to_rgb,
                                              _rgb_to_hsv, _hsv_to_rgb)
    import jax.numpy as jnp

    # round-trip exactness of the HSL transform pair
    rng = np.random.default_rng(3)
    c = jnp.asarray(rng.uniform(0, 1, (64, 3)).astype(np.float32))
    h, s, l_ = _rgb_to_hsl(c)
    back = _hsl_to_rgb(h, s, l_)
    np.testing.assert_allclose(np.asarray(back), np.asarray(c), atol=2e-6)

    b = _tex_scene({"type": "blend", "stype": "lin", "use_color_ramp": True,
                    "ramp_color_mode": "hsl",
                    "ramp_items": [
                        {"position": 0.0, "color": (1, 0, 0, 1)},
                        {"position": 1.0, "color": (1, 1, 1, 1)}]})
    scene = b.compile("cam")
    p = jnp.asarray([[-1, 0, 0], [1, 0, 0], [0, 0, 0]], jnp.float32)
    col = np.asarray(sample_texture(scene, jnp.zeros(3, jnp.int32), p,
                                    p[..., :2]))
    np.testing.assert_allclose(col[0, :3], (1, 0, 0), atol=1e-4)
    np.testing.assert_allclose(col[1, :3], (1, 1, 1), atol=1e-4)
    # analytic midpoint: hsl lerp h=0, s: 1->0 = 0.5, l: 0.5->1 = 0.75
    mid = _hsl_to_rgb(jnp.asarray(0.0), jnp.asarray(0.5), jnp.asarray(0.75))
    np.testing.assert_allclose(col[2, :3], np.asarray(mid), atol=1e-3)
    # ... which differs from the HSV midpoint (h=0, s=0.5, v=1)
    mid_hsv = _hsv_to_rgb(jnp.asarray(0.0), jnp.asarray(0.5),
                          jnp.asarray(1.0))
    assert np.abs(np.asarray(mid) - np.asarray(mid_hsv)).max() > 0.1
    assert np.abs(col[2, :3] - np.asarray(mid_hsv)).max() > 0.1
