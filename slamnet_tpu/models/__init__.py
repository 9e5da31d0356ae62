from . import coreslam, hector, particle

__all__ = ["coreslam", "hector", "particle"]
