from .mesh import (batch_sharding, default_mesh, replicated_sharding,
                   shard_batch)

__all__ = ['default_mesh', 'batch_sharding', 'replicated_sharding',
           'shard_batch']
