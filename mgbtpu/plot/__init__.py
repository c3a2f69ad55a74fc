from .plotting import animation_html, plot, save_animation

__all__ = ["animation_html", "plot", "save_animation"]
