from . import film, intersect, sdf

__all__ = ["film", "intersect", "sdf"]
