"""Render helper called by the native C API layer (native/yafaray_tpu_c_api.cc).

Entry point `render_for_capi(builder, render_params, outputs, layers,
pass_cb)`, mirroring the reference's Interface::setupRender + render sequence
(interface.cc:325-334 -> Scene::render scene.cc:203-263): parses the staged
render ParamMap, compiles the scene per render view, renders every view,
resolves the requested AOV layers and writes every named output
(ImageFilm::flush -> ImageOutput, imagefilm.cc:570-670).

Returns (views, resx, resy) where views is an ordered dict
{view_name: {layer_name: float32 ndarray [H,W,4]}} — the C++ layer walks it
to fire the notifyView/notifyLayer/putPixel/flushArea/flush callbacks.

`pass_cb(done, total, tag) -> bool` is invoked once per sample pass; a False
return cancels the render (yafaray_cancelRendering analogue of
RenderControl::setCanceled checked in the pass loop).
"""
from __future__ import annotations

import os

import jax
import numpy as np

from . import film as F
from . import params as P
from .integrators.mc import make_integrator
from .render import AAParams, render
from .utils.logger import RenderControl

# Persistent XLA compile cache for embedded sessions: every C client is a
# fresh process that would otherwise recompile the whole render pipeline
# (the dominant cost of the tiny test scenes). Opt out with
# YAFARAY_TPU_CACHE_DIR="".
_cache_dir = os.environ.get(
    "YAFARAY_TPU_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "yafaray_tpu_xla"))
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _aa_params(pm: P.ParamMap) -> AAParams:
    return AAParams(
        aa_samples=pm.get_int("AA_minsamples", 4),
        aa_passes=pm.get_int("AA_passes", 1),
        aa_inc_samples=pm.get_int("AA_inc_samples", 1),
        threshold=pm.get_float("AA_threshold", 0.05),
        dark_detection_type=pm.get_string("AA_dark_detection_type", "none"),
        dark_threshold_factor=pm.get_float("AA_dark_threshold_factor", 0.0),
        detect_color_noise=pm.get_bool("AA_detect_color_noise", False),
        variance_edge_size=pm.get_int("AA_variance_edge_size", 10),
        variance_pixels=pm.get_int("AA_variance_pixels", 0),
    )


def _pad4(img: np.ndarray) -> np.ndarray:
    """Pad a resolved layer to RGBA float32 [H,W,4] for the C ABI."""
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    c = img.shape[-1]
    if c == 4:
        return np.ascontiguousarray(img)
    out = np.ones(img.shape[:2] + (4,), np.float32)
    if c == 1:
        out[..., 0] = out[..., 1] = out[..., 2] = img[..., 0]
    else:
        out[..., :c] = img
    return out


def render_for_capi(builder, render_params: dict, outputs=None, layers=None,
                    pass_cb=None):
    pm = P.ParamMap(render_params or {})
    builder.set_render_params(dict(pm))

    integ_pm = {k[len("integrator_"):]: v for k, v in pm.items()
                if k.startswith("integrator_")}
    integ_pm.setdefault("type", pm.get_string("integrator_type",
                                              "pathtracing"))
    if "raydepth" in pm:
        integ_pm.setdefault("raydepth", pm.get_int("raydepth", 4))
    cfg = make_integrator(integ_pm)

    # requested AOV layers (yafaray_defineLayer staging)
    layer_names = ["combined"]
    for lp in (layers or []):
        lpm = P.ParamMap(lp)
        name = lpm.get_string("type", "")
        if name and name in F.LAYER_CHANNELS and name not in layer_names:
            layer_names.append(name)

    control = RenderControl()

    def progress(done, total):
        if pass_cb is not None and not pass_cb(int(done), int(total), "pass"):
            control.set_canceled()

    # view list: declared render views, else one implicit view per the
    # staged camera (Scene::render's per-view loop, scene.cc:227-259)
    view_names = list(getattr(builder, "render_views", {}).keys())
    views_out = {}
    resx = resy = 0
    first_combined = None
    for view in (view_names or [""]):
        if view:
            scene = builder.compile_view(view)
        else:
            scene = builder.compile(pm.get_string("camera_name", "") or None)
        width = pm.get_int("width", scene.camera.resx)
        height = pm.get_int("height", scene.camera.resy)
        film = render(
            scene, cfg, width, height, aa=_aa_params(pm),
            layer_names=tuple(layer_names),
            flt_kind=pm.get_string("filter_type", "box"),
            flt_width=pm.get_float("AA_pixelwidth", 1.0),
            computer_node=pm.get_int("adv_computer_node", 0),
            film_path=pm.get_string("film_path", "") or None,
            film_load_save_mode=pm.get_string("film_load_save_mode", "none"),
            progress_cb=progress, render_control=control)
        resolved = {}
        for name in layer_names:
            resolved[name] = _pad4(F.resolve(film, name))
        views_out[view or "view0"] = resolved
        if first_combined is None:
            first_combined = resolved["combined"]
            resx, resy = int(width), int(height)
        # named outputs (ImageOutput flush): each with its own path,
        # color space and gamma (image_output.cc)
        from .io import save_image
        for name, opm in (outputs or []):
            opm = P.ParamMap(opm)
            path = opm.get_string("image_path", "")
            if not path:
                continue
            if len(views_out) > 1 or (view and view_names[0] != view):
                stem, dot, ext = path.rpartition(".")
                path = f"{stem}_{view}{dot}{ext}" if dot else f"{path}_{view}"
            lay = opm.get_string("layer", "combined")
            img_out = resolved.get(lay, resolved["combined"])
            if opm.get_bool("denoise_enabled", False):
                # ImageOutput denoise (image_output.cc:90-93 DenoiseParams)
                from .io.postprocess import denoise
                img_out = denoise(img_out,
                                  hlum=opm.get_float("denoise_h_lum", 3.0),
                                  hcol=opm.get_float("denoise_h_col", 3.0),
                                  mix=opm.get_float("denoise_mix", 0.8))
            save_image(path, img_out,
                       color_space=opm.get_string("color_space", "sRGB"),
                       gamma=opm.get_float("gamma", 1.0))
        if control.canceled:
            break
    return views_out, first_combined, resx, resy
