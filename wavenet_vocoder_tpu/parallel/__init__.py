from wavenet_vocoder_tpu.parallel.sharding import (  # noqa: F401
    data_parallel_batch_size,
    make_mesh,
    replicate,
    shard_batch,
    shard_state,
)
from wavenet_vocoder_tpu.parallel.distributed import (  # noqa: F401
    global_batch_from_local,
    initialize_distributed,
    is_primary,
    local_batch_size,
    replicate_global,
)
