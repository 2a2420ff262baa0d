from effi_mvs_plus_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, fit_data_mesh, shard_batch, replicate, ShardingPolicy,
    use_policy,
    constrain_batch, constrain_volume, constrain_spatial,
    constrain_views_volume, constrain_view_batch,
)
from effi_mvs_plus_tpu.parallel.distributed import (  # noqa: F401
    initialize, is_main, global_mesh, host_local_batch, mean_metrics,
    partition, barrier,
)
