from wavenet_vocoder_tpu.parallel.sharding import (  # noqa: F401
    data_parallel_batch_size,
    make_mesh,
    replicate,
    shard_batch,
    shard_state,
)
