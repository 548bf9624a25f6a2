from chaorec_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    shard_params,
    make_sharded_train_step,
)
