from . import (bilinear, correlate, gn, holemap, logodds, obstacle, rasterize,
               score)

__all__ = ["bilinear", "gn", "holemap", "logodds", "obstacle", "rasterize",
           "score"]
