from .sharding import make_mesh, shard_params, ShardingConfig

__all__ = ["ShardingConfig", "make_mesh", "shard_params"]
