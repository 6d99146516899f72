"""Architect camera projection + DarkSky extended model (de-aliased from
perspective / sunsky this round).

Reference parity: src/camera/camera_architect.cc (vertical-line
preservation), src/background/background_darksky.cc (prePerez
normalization, altitude, exposure curve, night mode)."""
import jax.numpy as jnp
import numpy as np

from libyafaray_tpu import params as P
from libyafaray_tpu.backgrounds import (make_background, make_darksky,
                                        _eval_darksky, eval_background)
from libyafaray_tpu.cameras import make_camera, shoot_rays, project


def _cam(kind):
    return make_camera(P.ParamMap({
        "type": kind, "from": (0.0, -10.0, 1.0), "to": (0.0, 0.0, 6.0),
        "up": (0.0, -10.0, 2.0), "resx": 64, "resy": 64, "fov": 60.0}))


def test_architect_preserves_verticals():
    """A world-vertical edge projects to constant image x with the
    architect camera even when the camera tilts upward; plain perspective
    makes it converge."""
    pts = jnp.asarray([[2.0, 0.0, 0.0], [2.0, 0.0, 4.0], [2.0, 0.0, 8.0]],
                      jnp.float32)
    pxa, pya, visa = project(_cam("architect"), pts)
    pxp, pyp, visp = project(_cam("perspective"), pts)
    pxa, pxp = np.asarray(pxa), np.asarray(pxp)
    assert np.asarray(visa).all()
    assert np.abs(pxa - pxa[0]).max() < 1e-3, pxa
    assert np.abs(pxp - pxp[0]).max() > 1.0, pxp   # perspective converges


def test_architect_shoot_project_roundtrip():
    """shoot_rays and project are mutually inverse for the architect
    projection (the ray through pixel p hits points that project to p)."""
    cam = _cam("architect")
    px = jnp.asarray([10.0, 32.0, 50.0], jnp.float32)
    py = jnp.asarray([8.0, 32.0, 60.0], jnp.float32)
    z = jnp.zeros(3)
    o, d, _ = shoot_rays(cam, px, py, z, z)
    p = o + d * 7.0
    px2, py2, vis = project(cam, p)
    np.testing.assert_allclose(np.asarray(px2), np.asarray(px), atol=1e-2)
    np.testing.assert_allclose(np.asarray(py2), np.asarray(py), atol=1e-2)
    assert np.asarray(vis).all()


def test_architect_differs_from_perspective_rays():
    cam_a, cam_p = _cam("architect"), _cam("perspective")
    px = jnp.asarray([5.0], jnp.float32)
    py = jnp.asarray([5.0], jnp.float32)
    z = jnp.zeros(1)
    _, da, _ = shoot_rays(cam_a, px, py, z, z)
    _, dp, _ = shoot_rays(cam_p, px, py, z, z)
    assert np.abs(np.asarray(da) - np.asarray(dp)).max() > 1e-3


def _dirs():
    th = np.linspace(0.05, 1.4, 24)
    ph = np.linspace(0, 2 * np.pi, 24, endpoint=False)
    tt, pp = np.meshgrid(th, ph)
    d = np.stack([np.sin(tt) * np.cos(pp), np.sin(tt) * np.sin(pp),
                  np.cos(tt)], -1).reshape(-1, 3)
    return jnp.asarray(d, jnp.float32)


def test_darksky_is_not_sunsky_alias():
    pm = {"type": "darksky", "from": (0.5, 0.5, 0.8), "turbidity": 3.0}
    bg_d = make_background(P.ParamMap(pm))
    bg_s = make_background(P.ParamMap({**pm, "type": "sunsky"}))
    assert bg_d.kind == "darksky" and bg_s.kind == "sunsky"

    class _S:
        background = bg_d
        textures = None
    class _S2:
        background = bg_s
        textures = None
    d = _dirs()
    vd = np.asarray(eval_background(_S, d))
    vs = np.asarray(eval_background(_S2, d))
    assert np.isfinite(vd).all() and (vd >= 0).all()
    assert vd.mean() > 1e-4
    # genuinely different models now
    assert np.abs(vd - vs).mean() / max(vs.mean(), 1e-6) > 0.05


def test_darksky_night_and_exposure():
    base = {"type": "darksky", "from": (0.4, 0.2, 0.5), "turbidity": 3.0}
    day = make_darksky(P.ParamMap(base))
    night = make_darksky(P.ParamMap({**base, "night": True}))
    noexp = make_darksky(P.ParamMap({**base, "exposure": 0.0}))
    d = _dirs()
    vday = np.asarray(_eval_darksky(day, d))
    vnight = np.asarray(_eval_darksky(night, d))
    vnoexp = np.asarray(_eval_darksky(noexp, d))
    # night sky is dim and blue-shifted, NOT black
    assert 0 < vnight.mean() < 0.12 * vday.mean()
    bluish = vnight[..., 2].mean() / max(vnight[..., 0].mean(), 1e-9)
    assert bluish > 1.2
    # exposure=0 disables the exp curve -> different luminance mapping
    assert np.abs(vnoexp - vday).mean() > 1e-4
    # circumsolar brightening: directions near the sun are brighter
    sun = np.asarray(day.sun_dir)
    cosg = np.asarray(d) @ sun
    near = vday[cosg > 0.98].mean()
    far = vday[cosg < 0.2].mean()
    assert near > far


def test_darksky_add_sun_light():
    from libyafaray_tpu import SceneBuilder
    b = SceneBuilder()
    b.create_material("m", {"type": "shinydiffusemat", "color": (0.7,) * 3})
    b.create_object("floor")
    b.set_current_material("m")
    i = [b.add_vertex(*p) for p in ((-1, -1, 0), (1, -1, 0),
                                    (1, 1, 0), (-1, 1, 0))]
    b.add_quad(*i)
    b.create_background({"type": "darksky", "from": (0.3, 0.3, 0.9),
                         "add_sun": True, "sun_power": 2.0})
    b.create_camera("cam", {"type": "perspective", "from": (0, -3, 1),
                            "to": (0, 0, 0), "up": (0, -3, 2),
                            "resx": 8, "resy": 8, "fov": 45.0})
    scene = b.compile("cam")
    from libyafaray_tpu.scene_types import LIGHT_SUN
    assert LIGHT_SUN in scene.lights.present_types
