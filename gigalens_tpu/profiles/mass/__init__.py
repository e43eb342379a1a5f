from gigalens_tpu.profiles.mass.dpie import DPIE, DPIEP, DPIS
from gigalens_tpu.profiles.mass.dpie_subhalo import DPIESubhalo, DPIESubhaloSeries
from gigalens_tpu.profiles.mass.epl import EPL
from gigalens_tpu.profiles.mass.hernquist import Hernquist, HernquistEllipse
from gigalens_tpu.profiles.mass.multipole import Multipole
from gigalens_tpu.profiles.mass.nfw import NFW, NFW_ELLIPSE, TNFW
from gigalens_tpu.profiles.mass.point import MassSheet, PointMass
from gigalens_tpu.profiles.mass.scaling import ScalingRelation
from gigalens_tpu.profiles.mass.series import MassSeries, ScalingRelationSeries
from gigalens_tpu.profiles.mass.shear import Shear
from gigalens_tpu.profiles.mass.sie import NIE, SIE, SIS

__all__ = [
    "EPL",
    "SIE",
    "SIS",
    "NIE",
    "Shear",
    "NFW",
    "NFW_ELLIPSE",
    "TNFW",
    "DPIS",
    "DPIE",
    "DPIEP",
    "ScalingRelation",
    "MassSeries",
    "ScalingRelationSeries",
    "DPIESubhalo",
    "DPIESubhaloSeries",
    "PointMass",
    "MassSheet",
    "Hernquist",
    "HernquistEllipse",
    "Multipole",
]
