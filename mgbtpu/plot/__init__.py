from .plotting import plot, save_animation

__all__ = ["plot", "save_animation"]
