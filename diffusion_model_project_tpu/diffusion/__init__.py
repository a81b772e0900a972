from .scheduler import DiffusionScheduler

__all__ = ["DiffusionScheduler"]
