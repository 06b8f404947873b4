"""Device-mesh setup and sharding helpers (data-parallel first)."""

from objectdetectionpl_tpu.parallel.distributed import (  # noqa: F401
    data_shard, host_local_batch, maybe_initialize, process_count,
    process_index)
from objectdetectionpl_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding, make_mesh, model_parallel_shardings, replicated_sharding,
    shard_batch, shard_model_parallel)
