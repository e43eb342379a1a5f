from gigalens_tpu.parallel.mesh import (
    default_mesh,
    replicate,
    shard_samples,
    round_to_multiple,
)

__all__ = ["default_mesh", "replicate", "shard_samples", "round_to_multiple"]
