from .sharding import make_mesh, batch_sharding, replicated, shard_batch_spec

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch_spec"]
