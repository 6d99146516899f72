"""IESNA LM-63 photometric file parser.

Replaces the reference's IES loader (src/light/light_ies_data.h /
light_ies.cc): parses the candela table and resamples the vertical-angle
profile into IES_RES uniform bins over [0, pi] for the light table's
`ies_pool` (lights/__init__.py `_ies_factor` does the runtime lerp).
Horizontal anisotropy is averaged out (the reference's sampling also keys
only on the vertical angle for its cone sampling).
"""
from __future__ import annotations

import numpy as np

IES_RES = 64


def parse_ies(path_or_text: str) -> np.ndarray:
    """Returns a [IES_RES] float32 multiplier profile normalized so the
    maximum candela value maps to 1.0."""
    if "\n" in path_or_text or "TILT" in path_or_text[:200]:
        text = path_or_text
    else:
        with open(path_or_text, "r", errors="replace") as f:
            text = f.read()
    # find the TILT line; numeric payload starts after it
    lines = text.splitlines()
    idx = 0
    for i, ln in enumerate(lines):
        if ln.strip().upper().startswith("TILT="):
            tilt = ln.strip().upper()[5:]
            idx = i + 1
            if tilt == "INCLUDE":
                # skip tilt block: <lamp-to-luminaire> <n> <angles> <factors>
                nums = _numbers(lines[idx:])
                n_pairs = int(nums[1])
                consumed = 2 + 2 * n_pairs
                flat = []
                while len(flat) < consumed and idx < len(lines):
                    flat += lines[idx].split()
                    idx += 1
            break
    nums = _numbers(lines[idx:])
    # header: lamps, lumens/lamp, multiplier, n_vert, n_horiz, photometric
    # type, units, w, l, h, ballast, future, input watts
    n_vert = int(nums[3])
    n_horiz = int(nums[4])
    mult = nums[2]
    pos = 13
    v_angles = np.asarray(nums[pos:pos + n_vert])
    pos += n_vert
    h_angles = np.asarray(nums[pos:pos + n_horiz])
    pos += n_horiz
    candela = np.asarray(nums[pos:pos + n_vert * n_horiz]).reshape(
        n_horiz, n_vert) * mult
    profile = candela.mean(axis=0)  # average over horizontal angles
    # resample onto uniform [0, 180] grid
    grid = np.linspace(0.0, 180.0, IES_RES)
    resampled = np.interp(grid, v_angles, profile,
                          left=profile[0], right=profile[-1])
    peak = resampled.max()
    if peak > 0:
        resampled = resampled / peak
    return resampled.astype(np.float32)


def _numbers(lines):
    out = []
    for ln in lines:
        for tok in ln.replace(",", " ").split():
            try:
                out.append(float(tok))
            except ValueError:
                pass
    return out
