from naz_tpu.parallel.mesh import (
    make_mesh,
    shard_chain_state,
    shard_data,
    sharded_loglik,
)

__all__ = ["make_mesh", "shard_chain_state", "shard_data", "sharded_loglik"]
