from gigalens_tpu.profiles.light.gaussian import Gaussian, Moffat
from gigalens_tpu.profiles.light.sersic import CoreSersic, Sersic, SersicEllipse
from gigalens_tpu.profiles.light.shapelets import Shapelets

__all__ = ["Sersic", "SersicEllipse", "CoreSersic", "Shapelets", "Gaussian", "Moffat"]
