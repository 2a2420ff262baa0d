from effi_mvs_plus_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, shard_batch, replicate, ShardingPolicy, use_policy,
    constrain_batch, constrain_volume, constrain_spatial,
)
