from .pytree import pytree_dataclass, to_dev
from .log import Log, safe_pow, Logger
from .maps import map_rows
from .errors import MGBConvergenceFailure
from .interpolate import interpolate, chebfun

__all__ = [
    "pytree_dataclass",
    "to_dev",
    "Log",
    "safe_pow",
    "Logger",
    "map_rows",
    "MGBConvergenceFailure",
    "interpolate",
    "chebfun",
]
