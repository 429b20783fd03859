from . import mesh
from .mesh import (BATCH_AXIS, PARTY_AXIS, batch_sharding, make_mesh,
                   replicate_cloud_key, replicated, shard_lwe_batch)
