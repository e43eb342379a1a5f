"""dPIE cluster-member (subhalo) populations: direct, series, Pallas-fused.

Reference: ``src/gigalens/jax/profiles/mass/dpie_subhalo.py`` and
``dpie_subhalo_series.py``. Default Faber-Jackson-like scaling powers 0.5 on
(theta_E, r_core, r_cut).
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from gigalens_tpu.profiles.base import MassProfile
from gigalens_tpu.profiles.mass.dpie import DPIE
from gigalens_tpu.profiles.mass.scaling import ScalingRelation
from gigalens_tpu.profiles.mass.series import ScalingRelationSeries

_DEFAULT_POWERS = {"theta_E": 0.5, "r_core": 0.5, "r_cut": 0.5}


class DPIESubhalo(ScalingRelation):
    """Direct sum of scaled dPIE members (exact, O(galaxies) per step)."""

    _params = ["theta_E", "r_core", "r_cut"]

    def __init__(
        self,
        lum_star: float,
        galaxy_catalogue: Dict[str, List],
        scaling_params_power: Optional[Dict[str, float]] = None,
        **kwargs,
    ):
        super().__init__(
            profile=DPIE(),
            scaling_params=["theta_E", "r_core", "r_cut"],
            lum_star=lum_star,
            scaling_params_power=scaling_params_power or dict(_DEFAULT_POWERS),
            galaxy_catalogue=galaxy_catalogue,
            **kwargs,
        )


class DPIESubhaloPallas(MassProfile):
    """dPIE member stack with the fused Pallas deflection kernel.

    ``deriv`` runs the VMEM-tiled galaxies x pixels kernel
    (:mod:`gigalens_tpu.ops.pallas.dpie_cluster`) with exact custom-VJP
    gradients w.r.t. the global (theta_E, r_core, r_cut) scalings; field
    quantities needing Hessians fall back to the XLA stack (they are evaluated
    at a handful of points, not over the image grid). On non-TPU backends
    ``deriv`` falls back to XLA too unless ``force_kernel``.
    """

    _name = "Scaled-dPIE-pallas"
    _params = ["theta_E", "r_core", "r_cut"]

    def __init__(
        self,
        lum_star: float,
        galaxy_catalogue: Dict[str, List],
        scaling_params_power: Optional[Dict[str, float]] = None,
        force_kernel: bool = False,
        **kwargs,
    ):
        super().__init__()
        from gigalens_tpu.ops.pallas.dpie_cluster import make_galaxy_table

        powers = scaling_params_power or dict(_DEFAULT_POWERS)
        self.table = jnp.asarray(
            make_galaxy_table(galaxy_catalogue, lum_star, powers)
        )
        self._xla = DPIESubhalo(
            lum_star, galaxy_catalogue, scaling_params_power=powers, **kwargs
        )
        self.use_kernel = force_kernel or jax.default_backend() == "tpu"

    def deriv(self, x, y, theta_E, r_core, r_cut):
        if not self.use_kernel:
            return self._xla.deriv(x, y, theta_E=theta_E, r_core=r_core, r_cut=r_cut)
        from gigalens_tpu.ops.pallas.dpie_cluster import dpie_cluster_deriv

        scales = jnp.stack(
            [jnp.reshape(theta_E, (-1,)), jnp.reshape(r_core, (-1,)),
             jnp.reshape(r_cut, (-1,))],
            axis=-1,
        )
        return dpie_cluster_deriv(scales, self.table, jnp.reshape(x, (-1,)),
                                  jnp.reshape(y, (-1,)))

    def hessian(self, x, y, **scales):
        return self._xla.hessian(x, y, **scales)

    def convergence(self, x, y, **scales):
        return self._xla.convergence(x, y, **scales)

    def shear(self, x, y, **scales):
        return self._xla.shear(x, y, **scales)


class DPIESubhaloSeries(ScalingRelationSeries):
    """Taylor-in-r_cut dPIE members (O(order) per step after precompute)."""

    _params = ["theta_E", "r_cut"]
    _constants = ["r_core", "center_x", "center_y", "e1", "e2"]
    _name = "Scaled-SeriesExpansion-dPIE"

    def __init__(
        self,
        lum_star: float,
        galaxy_catalogue: Dict[str, List],
        scaling_params_power: Optional[Dict[str, float]] = None,
        order: int = 3,
        chunk_size: Optional[int] = None,
    ):
        super().__init__(
            profile=DPIE(),
            series_param="r_cut",
            amplitude_param="theta_E",
            scaling_params=["theta_E", "r_core", "r_cut"],
            lum_star=lum_star,
            scaling_params_power=scaling_params_power or dict(_DEFAULT_POWERS),
            galaxy_catalogue=galaxy_catalogue,
            order=order,
            chunk_size=chunk_size,
        )
