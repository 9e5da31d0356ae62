from . import hessian, mesh, search, tiles
from .mesh import (host_local_scans_to_global, initialize_multihost,
                   make_mesh, replicated, sharded)

__all__ = ["hessian", "mesh", "search", "tiles", "make_mesh", "replicated",
           "sharded", "initialize_multihost", "host_local_scans_to_global"]
