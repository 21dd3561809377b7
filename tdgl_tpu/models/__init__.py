from . import gtdgl

__all__ = ["gtdgl"]
