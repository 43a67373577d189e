from naz_tpu.parallel.mesh import (
    make_mesh,
    shard_chain_state,
    shard_chees_state,
    shard_data,
    sharded_loglik,
)
from naz_tpu.parallel.distributed import initialize_multihost

__all__ = [
    "make_mesh",
    "shard_chain_state",
    "shard_chees_state",
    "shard_data",
    "sharded_loglik",
    "initialize_multihost",
]
