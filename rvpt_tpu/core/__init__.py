from . import math, rng, sampling, types
from .types import Isect, Ray

__all__ = ["math", "rng", "sampling", "types", "Ray", "Isect"]
