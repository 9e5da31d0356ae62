from . import coreslam, graph_slam, hector, particle

__all__ = ["coreslam", "graph_slam", "hector", "particle"]

# sharded/fleet variants import lazily-heavy deps; import them explicitly:
#   from slamnet_tpu.models import (coreslam_sharded, hector_sharded,
#                                   graph_slam_sharded, fleet)
