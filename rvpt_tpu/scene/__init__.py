from . import materials
from .materials import Materials
from .scene import Scene, SceneBuilder

__all__ = ["materials", "Materials", "Scene", "SceneBuilder"]
