from qbmx.parallel.mesh import (
    make_mesh,
    make_dqbm_sharded_step,
    make_cdqbm_sharded_step,
    shard_model,
)

__all__ = [
    "make_mesh",
    "make_dqbm_sharded_step",
    "make_cdqbm_sharded_step",
    "shard_model",
]
