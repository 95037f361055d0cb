"""rvpt_tpu: a TPU-native differentiable path tracer.

Brand-new framework with the capabilities of GraphicsProgramming/RVPT (a
real-time Vulkan compute-shader path tracer), rebuilt idiomatically on
JAX/XLA/Pallas.  See SURVEY.md at the repo root for the component map.
"""

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # Honor JAX_PLATFORMS BEFORE any submodule import: importing the package
    # initializes the JAX backend (a site-installed TPU plugin wins the
    # platform race), and jax.config.update("jax_platforms", ...) is
    # ineffective once a backend exists — so `python -m rvpt_tpu.cli` with
    # JAX_PLATFORMS=cpu would silently run on the TPU tunnel (measured;
    # round-2 fix).  Tests/CLI rely on this running first.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])

from .config import FilmConfig, RenderSettings
from .core.types import Isect, Ray
from .models.camera import Camera
from .ops.film import Film
from .scene.scene import Scene, SceneBuilder

__version__ = "0.1.0"

__all__ = [
    "Camera",
    "Film",
    "FilmConfig",
    "Isect",
    "Ray",
    "RenderSettings",
    "Scene",
    "SceneBuilder",
]
