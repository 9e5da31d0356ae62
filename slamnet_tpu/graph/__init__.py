from . import distributed, frontend, posegraph
from .posegraph import PoseGraph, add_edge, add_node, gn_step, optimize

__all__ = ["distributed", "frontend", "posegraph", "PoseGraph", "add_edge",
           "add_node", "gn_step", "optimize"]
