from .mesh import create_mesh, batch_sharding, replicated_sharding

__all__ = ["create_mesh", "batch_sharding", "replicated_sharding"]
