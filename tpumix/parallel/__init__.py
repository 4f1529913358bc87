from tpumix.parallel.mesh import (  # noqa: F401
    batch_sharding,
    data_parallel_jit,
    make_mesh,
    replicated,
    shard_batch,
)
