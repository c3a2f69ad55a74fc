from .sharding import make_mesh, node_sharding, shard_fargs

__all__ = ["make_mesh", "node_sharding", "shard_fargs"]
