from .mesh import create_mesh, data_sharding, replicate_sharding

__all__ = ["create_mesh", "data_sharding", "replicate_sharding"]
