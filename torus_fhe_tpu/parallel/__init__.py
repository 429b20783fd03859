from . import mesh, mk_pipeline
from .mesh import (BATCH_AXIS, PARTY_AXIS, batch_sharding, make_mesh,
                   replicate_cloud_key, replicated, shard_lwe_batch)
from .mk_pipeline import (build_sharded_mk_fb, mk_blind_rotate_pipelined,
                          mk_bootstrap_pipelined)
