from gigalens_tpu.ops.psf import PSFConv, average_pool, subgrid_kernel

__all__ = ["PSFConv", "average_pool", "subgrid_kernel"]
