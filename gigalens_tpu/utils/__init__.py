from gigalens_tpu.utils.checkpoint import PipelineCheckpointer
from gigalens_tpu.utils.diagnostics import (
    effective_sample_size,
    potential_scale_reduction,
)

__all__ = [
    "PipelineCheckpointer",
    "effective_sample_size",
    "potential_scale_reduction",
]
