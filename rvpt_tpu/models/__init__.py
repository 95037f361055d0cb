from . import brdf, camera, integrators

__all__ = ["brdf", "camera", "integrators"]
