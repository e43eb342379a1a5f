from gigalens_tpu.utils.checkpoint import PipelineCheckpointer
from gigalens_tpu.utils.diagnostics import (
    effective_sample_size,
    potential_scale_reduction,
)
from gigalens_tpu.utils.images import find_images
from gigalens_tpu.utils.summary import format_summary, summarize_posterior

__all__ = [
    "PipelineCheckpointer",
    "effective_sample_size",
    "potential_scale_reduction",
    "summarize_posterior",
    "format_summary",
    "find_images",
]
