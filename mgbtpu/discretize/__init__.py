from .geometry import Geometry, dedupe
from .tensorfem import (TensorFEM, fem1d, fem2d, fem3d, tensor_dofmap,
                        find_boundary_tensorfem)
from .spectral import Spectral1D, Spectral2D, spectral1d, spectral2d
from .fem2d_p1 import FEM2DP1, fem2d_P1
from .fem2d_p2 import FEM2DP2, fem2d_P2

__all__ = [
    "Geometry", "dedupe",
    "TensorFEM", "fem1d", "fem2d", "fem3d", "tensor_dofmap",
    "Spectral1D", "Spectral2D", "spectral1d", "spectral2d",
    "FEM2DP1", "fem2d_P1", "FEM2DP2", "fem2d_P2",
    "find_boundary_tensorfem",
]
