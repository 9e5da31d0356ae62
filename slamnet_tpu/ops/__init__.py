from . import holemap, obstacle, rasterize, score

__all__ = ["holemap", "obstacle", "rasterize", "score"]
