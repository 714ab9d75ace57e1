from mmgt_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    param_shardings,
    replicated,
)
