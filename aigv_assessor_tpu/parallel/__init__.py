from aigv_assessor_tpu.parallel.sharding import (  # noqa: F401
    make_param_shardings,
    param_spec,
    shard_batch,
    shard_params,
)
