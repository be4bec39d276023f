from .sharding import ReplicaMesh, replica_mesh

__all__ = ["ReplicaMesh", "replica_mesh"]
