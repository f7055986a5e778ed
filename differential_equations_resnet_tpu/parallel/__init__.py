"""Device mesh + sharding: the TPU-native parallelism layer (the reference has
no distributed backend at all — SURVEY.md section 2.3; here DP/TP are
first-class via jax.sharding + jit, collectives ride ICI)."""

from differential_equations_resnet_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    initialize_multihost,
    local_batch_slice,
    replicated_sharding,
    shard_batch,
    shard_params,
)
from differential_equations_resnet_tpu.parallel.shard_map_step import (  # noqa: F401
    make_shard_map_train_step,
)
from differential_equations_resnet_tpu.parallel.pipeline import (  # noqa: F401
    pipeline_blocks_apply,
    pipeline_scan,
)
