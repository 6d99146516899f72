"""Image parity against the ACTUAL reference renderer (libYafaRay).

The goldens in tests/golden/ are rendered by the reference binary itself —
built from /root/reference (CMake Release, FAST_MATH+FAST_TRIG) and driven
by the C clients in tools/refparity/ (the same C-API sequence as the
reference's own tests/test00/test00.c). They are LINEAR-color-space
Radiance .hdr files, so the comparison happens in radiance units with no
gamma or 8-bit quantization (RGBE shared-exponent mantissa error ~0.4%).

This closes BASELINE.md config 1's "CPU reference render as golden" and is
the one form of correctness evidence internal oracles cannot provide
(VERDICT r4 missing #1): the reference binary is the arbiter.

## The pi convention (measured, not assumed)

The reference's diffuse BRDF eval returns rho with NO 1/pi
(material_shiny_diffuse.cc:239 `m_d * diffuse_color`), while its
cosine-hemisphere sample pdf also omits the 1/pi
(material_shiny_diffuse.cc sample: `s.pdf_ = |wi.n| * width`), so
BSDF-sampled bounce throughput is rho — identical to our physically
normalized rho/pi BRDF with the true cos/pi pdf. Light connections do NOT
get that cancellation: illumSample contributions come out exactly pi x the
physical estimator for every light type (arealight additionally stores
color*power*pi, light_area.cc:41, cancelled by the pi in its pdf,
light_area.cc:88; pointlight stores color*power with pdf=d^2,
light_point.cc:34,75). Net: EVERY transport path in the reference carries
exactly ONE extra pi relative to the physical estimator, independent of
depth — a single global scale. Measured on this scene: ours*pi / reference
global ratio 0.9993 (the comparison below asserts it within 1%).
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from libyafaray_tpu import io as yio, make_integrator, film as F
from libyafaray_tpu.render import render
from scenes import cornell_builder

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _downsample(x, k=4):
    h, w, c = x.shape
    return x.reshape(h // k, k, w // k, k, c).mean(axis=(1, 3))


@pytest.mark.refparity
@pytest.mark.timeout(900)
def test_cornell_direct_matches_reference_render():
    """BASELINE.md config 1: the test00-style Cornell box under the
    directlighting integrator, ours vs the reference renderer's own output.

    Golden: tools/refparity/cornell_ref.c at 256x256, 512 spp x 4 light
    samples (2048 area-light samples/pixel, sigma_rel ~1.5%). Ours:
    96 spp x 1 light sample (sigma_rel ~10% per pixel in penumbrae —
    our integrator draws one area-light sample per pass; the reference
    honors its per-light `samples`).

    Tolerances are set by the MC noise of OUR render (the looser side):
    - global scale (ours*pi / ref) within 1%: pins the estimator
      conventions; a missing pi (314%), a wrong light fold, a cosine or
      area error would all blow far past this.
    - full-res mean relative error < 4%: mean over 65k pixels averages
      per-pixel noise down to <1%; headroom for the ~50 penumbra-edge
      pixels where 96-sample noise peaks.
    - 4x4 box-downsampled p99 < 6%, max < 15%: patch means have 16x the
      samples (sigma ~2.5%); this catches any LOCALIZED disagreement
      (wrong shadow shape, displaced geometry, flipped texture) that the
      global metrics would dilute. Measured on this host: p99 4.3%,
      max 10.6%.
    """
    ref = np.asarray(
        yio.load_hdr(os.path.join(GOLDEN, "cornell_ref_256.hdr")))[..., :3]
    b = cornell_builder()
    # reference arealights are invisible to camera rays (never scene
    # primitives); mirror that so the lamp region compares the ceiling
    b.lights["lamp"]["visibility"] = "invisible"
    b.cameras["cam"]["resx"] = 256
    b.cameras["cam"]["resy"] = 256
    scene = b.compile("cam")
    cfg = make_integrator({"type": "directlighting"})
    film = render(scene, cfg, 256, 256, spp=96)
    img = np.asarray(F.resolve(film, "combined"))[..., :3] * np.pi

    assert np.isfinite(img).all()
    scale = img.mean() / ref.mean()
    assert abs(scale - 1.0) < 0.01, f"global radiance scale off: {scale}"

    lit = ref.max(-1) > 0.05
    rel = np.abs(img - ref).max(-1)[lit] / ref.max(-1)[lit]
    assert rel.mean() < 0.04, f"mean relative error {rel.mean():.4f}"

    rd, od = _downsample(ref), _downsample(img)
    litd = rd.max(-1) > 0.05
    reld = np.abs(od - rd).max(-1)[litd] / rd.max(-1)[litd]
    p99 = float(np.percentile(reld, 99))
    assert p99 < 0.06, f"downsampled p99 relative error {p99:.4f}"
    assert reld.max() < 0.15, f"downsampled max relative error {reld.max():.4f}"
