from .grid import Grid
from .kdtree import KDTree
from .point import Point
from .points import Points
from .index import SpatialIndex

__all__ = ["Grid", "KDTree", "Point", "Points", "SpatialIndex"]
