"""Unit tests: math, sampler, color foundations."""
import jax
import jax.numpy as jnp
import numpy as np

from libyafaray_tpu import color as C
from libyafaray_tpu import sampler
from libyafaray_tpu.math import bound, vec


def test_normalize_and_dot():
    v = jnp.array([[3.0, 0.0, 4.0], [0.0, 2.0, 0.0]])
    n = vec.normalize(v)
    np.testing.assert_allclose(vec.length(n), [1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(vec.dot(n[0], n[0]), 1.0, atol=1e-6)


def test_reflect_refract():
    n = jnp.array([[0.0, 0.0, 1.0]])
    wo = vec.normalize(jnp.array([[1.0, 0.0, 1.0]]))
    r = vec.reflect(wo, n)
    np.testing.assert_allclose(np.asarray(r[0]),
                               np.asarray(vec.normalize(jnp.array([[-1.0, 0, 1.0]]))[0]),
                               atol=1e-6)
    # refraction into denser medium bends toward normal
    wt, tir = vec.refract(wo, n, jnp.array([1.5]))
    assert not bool(tir[0])
    assert wt[0, 2] < 0  # transmitted goes below surface
    sin_i = float(jnp.sqrt(1 - vec.dot(wo, n) ** 2)[0])
    sin_t = float(jnp.sqrt(wt[0, 0] ** 2 + wt[0, 1] ** 2))
    np.testing.assert_allclose(sin_t, sin_i / 1.5, atol=1e-5)


def test_fresnel_limits():
    # normal incidence on glass: ~4%
    fr = vec.fresnel_dielectric(jnp.array([1.0]), jnp.array([1.5]))
    np.testing.assert_allclose(float(fr[0]), 0.04, atol=0.002)
    # grazing: -> 1
    fr = vec.fresnel_dielectric(jnp.array([0.001]), jnp.array([1.5]))
    assert float(fr[0]) > 0.98


def test_onb_orthogonal():
    d = vec.normalize(jnp.array(np.random.default_rng(0).normal(size=(64, 3)),
                                dtype=jnp.float32))
    u, v = vec.orthonormal_basis(d)
    np.testing.assert_allclose(vec.dot(u, d), 0.0, atol=1e-5)
    np.testing.assert_allclose(vec.dot(v, d), 0.0, atol=1e-5)
    np.testing.assert_allclose(vec.dot(u, v), 0.0, atol=1e-5)
    np.testing.assert_allclose(vec.length(u), 1.0, atol=1e-5)
    # right-handed: u x v = d
    np.testing.assert_allclose(np.asarray(vec.cross(u, v)), np.asarray(d),
                               atol=1e-5)


def test_cosine_hemisphere_distribution():
    u = sampler.rand4(jnp.arange(20000, dtype=jnp.uint32), 0, 0, 0)
    d = vec.cosine_sample_hemisphere(u[:, 0], u[:, 1])
    assert float(jnp.min(d[:, 2])) >= 0.0
    # E[cos] under cos-weighted pdf = 2/3
    np.testing.assert_allclose(float(jnp.mean(d[:, 2])), 2.0 / 3.0, atol=0.01)


def test_power_heuristic():
    w = vec.power_heuristic(jnp.array([1.0]), jnp.array([1.0]))
    np.testing.assert_allclose(float(w[0]), 0.5)
    w = vec.power_heuristic(jnp.array([10.0]), jnp.array([0.1]))
    assert float(w[0]) > 0.99


def test_pcg4d_uniform():
    ids = jnp.arange(100000, dtype=jnp.uint32)
    r = sampler.rand1(ids, 0, 0, 0)
    assert 0.0 <= float(jnp.min(r)) and float(jnp.max(r)) < 1.0
    np.testing.assert_allclose(float(jnp.mean(r)), 0.5, atol=0.005)
    np.testing.assert_allclose(float(jnp.var(r)), 1.0 / 12.0, atol=0.002)
    # decorrelated across dims
    r2 = sampler.rand1(ids, 0, 0, 1)
    corr = np.corrcoef(np.asarray(r), np.asarray(r2))[0, 1]
    assert abs(corr) < 0.02


def test_ld02_stratification():
    # first 16 samples of the (0,2) sequence cover all 16 strata in each dim
    n = jnp.arange(16, dtype=jnp.uint32)
    key = jnp.zeros((16,), jnp.uint32) + 5
    u0, u1 = sampler.ld02(n, key)
    assert len(set((np.asarray(u0) * 16).astype(int))) == 16
    assert len(set((np.asarray(u1) * 16).astype(int))) == 16


def test_halton():
    h = sampler.halton(jnp.arange(1, 9, dtype=jnp.uint32), 0)  # base 2
    np.testing.assert_allclose(np.asarray(h[:3]), [0.5, 0.25, 0.75], atol=1e-5)


def test_srgb_roundtrip():
    x = jnp.linspace(0.0, 1.0, 64)
    np.testing.assert_allclose(np.asarray(C.srgb_to_linear(C.linear_to_srgb(x))),
                               np.asarray(x), atol=1e-5)


def test_wl_to_rgb_integrates_to_white():
    wl = jnp.linspace(0.0, 1.0, 512)
    rgb = C.wl_to_rgb(wl)
    mean = np.asarray(jnp.mean(rgb, axis=0))
    np.testing.assert_allclose(mean, 1.0, atol=0.15)


def test_ray_slab():
    bmin = jnp.array([0.0, 0.0, 0.0])
    bmax = jnp.array([1.0, 1.0, 1.0])
    o = jnp.array([[0.5, 0.5, -1.0], [2.0, 2.0, -1.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)
    hit, tn, tf = bound.ray_slab(bmin, bmax, o, inv, 0.0, 100.0)
    assert bool(hit[0]) and not bool(hit[1])
    np.testing.assert_allclose(float(tn[0]), 1.0, atol=1e-5)


def test_image_format_roundtrips(tmp_path):
    """Format parity (reference src/format/*: tga hdr exr jpg png tif).
    EXR is implemented natively (io/exr.py) including multi-layer files,
    the reference's only multi-layer output (format_exr.cc)."""
    from libyafaray_tpu.io import save_image, load_image
    from libyafaray_tpu.io.exr import save_exr, load_exr
    rng = np.random.default_rng(0)
    hdr_img = rng.random((9, 11, 3)).astype(np.float32) * 4.0
    # smooth gradient for the lossy-codec roundtrips (noise is a JPEG
    # worst case and only measures DCT error, not our plumbing)
    gy, gx = np.mgrid[0:9, 0:11].astype(np.float32)
    ldr_img = np.stack([gx / 10.0, gy / 8.0, 0.5 + 0 * gx], -1)

    p = str(tmp_path / "t.exr")
    save_image(p, hdr_img, color_space="LinearRGB")
    np.testing.assert_array_equal(load_image(p)[..., :3], hdr_img)

    p = str(tmp_path / "t.hdr")
    save_image(p, hdr_img, color_space="LinearRGB")
    back = load_image(p)
    # RGBE shares one exponent across channels: error bounded by the
    # pixel's max channel, not per-channel relative
    ptol = 0.01 * hdr_img.max(axis=-1, keepdims=True)
    assert (np.abs(back - hdr_img) <= ptol + 1e-4).all()

    for ext, tol in (("png", 0.01), ("tga", 0.01), ("jpg", 0.1),
                     ("tif", 0.01)):
        p = str(tmp_path / f"t.{ext}")
        save_image(p, ldr_img)  # sRGB 8-bit; loaders return linear floats
        back = load_image(p)[..., :3]
        assert np.abs(back - ldr_img).mean() < tol, ext

    # multi-layer EXR (half precision) with layer selection
    layers = {"combined": hdr_img,
              "normals": rng.standard_normal((9, 11, 3)).astype(np.float32)}
    p = str(tmp_path / "ml.exr")
    save_exr(p, layers, half=True)
    got = load_exr(p, layer="*")
    assert set(got) == {"", "normals"}
    np.testing.assert_allclose(got["normals"], layers["normals"],
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(load_exr(p, layer="normals"),
                               layers["normals"], rtol=2e-3, atol=2e-3)
