from py4cast_tpu.parallel.mesh import (  # noqa: F401
    MeshConfig,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
