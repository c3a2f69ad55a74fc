from .gmsh import gmsh_import

__all__ = ["gmsh_import"]
