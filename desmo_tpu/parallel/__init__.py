"""Multi-device scaling over a JAX device mesh."""

from desmo_tpu.parallel.sharding import (  # noqa: F401
    distributed_init,
    make_mesh,
    batch_shardings,
    ensemble_param_shardings,
    param_shardings,
    state_shardings,
    shard_batch,
    shard_state,
)
