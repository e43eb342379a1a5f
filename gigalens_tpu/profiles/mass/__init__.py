from gigalens_tpu.profiles.mass.epl import EPL
from gigalens_tpu.profiles.mass.shear import Shear
from gigalens_tpu.profiles.mass.sie import SIE, SIS

__all__ = ["EPL", "SIE", "SIS", "Shear"]
