from d2r_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    make_param_shardings,
    seq_sharding_constraint,
    shard_batch,
)
from d2r_tpu.parallel import distributed  # noqa: F401
