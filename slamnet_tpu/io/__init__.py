from . import checkpoint, export, metrics

__all__ = ["checkpoint", "export", "metrics"]
