from . import coreslam, graph_slam, hector, particle

__all__ = ["coreslam", "graph_slam", "hector", "particle"]
