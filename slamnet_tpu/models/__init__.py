from . import coreslam

__all__ = ["coreslam"]
