from . import hessian, mesh, search, tiles
from .mesh import make_mesh, replicated, sharded

__all__ = ["hessian", "mesh", "search", "tiles", "make_mesh", "replicated",
           "sharded"]
