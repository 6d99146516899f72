"""ParamMap-style configuration + type-string factory registries.

Mirrors the reference's single configuration mechanism — a typed variant map
parsed by every factory (include/common/param.h:38-112) and per-category
`factory(type-string)` dispatch (9 factories cited in SURVEY.md par.5) — so
reference scene descriptions map 1:1 onto this framework.
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import numpy as np


class ParamMap(dict):
    """A dict with typed getters; the only config mechanism, like the ref's."""

    def get_int(self, key: str, default: int = 0) -> int:
        return int(self.get(key, default))

    def get_bool(self, key: str, default: bool = False) -> bool:
        return bool(self.get(key, default))

    def get_float(self, key: str, default: float = 0.0) -> float:
        return float(self.get(key, default))

    def get_string(self, key: str, default: str = "") -> str:
        return str(self.get(key, default))

    def get_vector(self, key: str, default=(0.0, 0.0, 0.0)) -> np.ndarray:
        return np.asarray(self.get(key, default), dtype=np.float32).reshape(3)

    def get_color(self, key: str, default=(0.0, 0.0, 0.0, 1.0)) -> np.ndarray:
        v = np.asarray(self.get(key, default), dtype=np.float32).ravel()
        if v.size == 1:
            v = np.array([v[0], v[0], v[0], 1.0], np.float32)
        elif v.size == 3:
            v = np.concatenate([v, [1.0]]).astype(np.float32)
        return v[:4]

    def get_matrix(self, key: str, default=None) -> np.ndarray:
        if key not in self and default is None:
            return np.eye(4, dtype=np.float32)
        return np.asarray(self.get(key, default), dtype=np.float32).reshape(4, 4)


class FactoryRegistry:
    """Named registry: type-string -> builder callable (like `X::factory`)."""

    def __init__(self, category: str):
        self.category = category
        self._builders: Dict[str, Callable[..., Any]] = {}
        self.aliases: Dict[str, str] = {}

    def register(self, *names: str):
        def deco(fn):
            for n in names:
                self._builders[n] = fn
            return fn
        return deco

    def create(self, type_name: str, *args, **kwargs):
        name = self.aliases.get(type_name, type_name)
        if name not in self._builders:
            raise KeyError(
                f"{self.category}: unknown type {type_name!r}; "
                f"known: {sorted(self._builders)}"
            )
        return self._builders[name](*args, **kwargs)

    def types(self):
        return sorted(self._builders)

    def __contains__(self, type_name: str) -> bool:
        return self.aliases.get(type_name, type_name) in self._builders


# Category registries mirroring the reference's factories
MATERIALS = FactoryRegistry("material")      # src/material/material.cc:52-60
LIGHTS = FactoryRegistry("light")            # src/light/light.cc:46-55
TEXTURES = FactoryRegistry("texture")        # src/texture/texture.cc:38-46
CAMERAS = FactoryRegistry("camera")          # src/camera/camera.cc:43-47
BACKGROUNDS = FactoryRegistry("background")  # src/background/background.cc:40-44
INTEGRATORS = FactoryRegistry("integrator")  # src/integrator/integrator.cc:46-58
VOLUMES = FactoryRegistry("volume")          # src/volume/volume.cc:41-45
OBJECTS = FactoryRegistry("object")          # src/geometry/object/object.cc:38-40
SHADER_NODES = FactoryRegistry("shader_node")  # src/shader/shader_node.cc:36-39
ACCELERATORS = FactoryRegistry("accelerator")  # src/accelerator/accelerator.cc:42-51
FORMATS = FactoryRegistry("format")          # src/format/format.cc:52-64
