"""Render helper called by the native C API layer (native/yafaray_tpu_c_api.cc).

One entry point, `render_for_capi(builder, render_params)`, mirroring the
reference's Interface::setupRender + render sequence (interface.cc:325-334):
parses the staged render ParamMap (AA samples/passes, threads->ignored,
integrator settings), compiles the scene, renders and returns the resolved
RGBA image as a numpy array.
"""
from __future__ import annotations

import numpy as np

from . import film as F
from . import params as P
from .integrators.mc import make_integrator
from .render import AAParams, render


def render_for_capi(builder, render_params: dict):
    pm = P.ParamMap(render_params or {})
    builder.set_render_params(dict(pm))
    camera = pm.get_string("camera_name", "") or None
    scene = builder.compile(camera)
    integ_pm = {k[len("integrator_"):]: v for k, v in pm.items()
                if k.startswith("integrator_")}
    integ_pm.setdefault("type", pm.get_string("integrator_type",
                                              "pathtracing"))
    if "raydepth" in pm:
        integ_pm.setdefault("raydepth", pm.get_int("raydepth", 4))
    cfg = make_integrator(integ_pm)
    width = pm.get_int("width", scene.camera.resx)
    height = pm.get_int("height", scene.camera.resy)
    aa = AAParams(
        aa_samples=pm.get_int("AA_minsamples", 4),
        aa_passes=pm.get_int("AA_passes", 1),
        aa_inc_samples=pm.get_int("AA_inc_samples", 1),
        threshold=pm.get_float("AA_threshold", 0.05),
    )
    film = render(scene, cfg, width, height, aa=aa,
                  flt_kind=pm.get_string("filter_type", "box"),
                  flt_width=pm.get_float("AA_pixelwidth", 1.0),
                  computer_node=pm.get_int("adv_computer_node", 0),
                  film_path=pm.get_string("film_path", "") or None,
                  film_load_save_mode=pm.get_string("film_load_save_mode",
                                                    "none"))
    img = np.asarray(F.resolve(film, "combined"), np.float32)
    return np.ascontiguousarray(img), int(width), int(height)
