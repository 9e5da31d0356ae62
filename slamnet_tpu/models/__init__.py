from . import coreslam, hector

__all__ = ["coreslam", "hector"]
