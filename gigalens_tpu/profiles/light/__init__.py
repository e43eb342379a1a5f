from gigalens_tpu.profiles.light.sersic import CoreSersic, Sersic, SersicEllipse
from gigalens_tpu.profiles.light.shapelets import Shapelets

__all__ = ["Sersic", "SersicEllipse", "CoreSersic", "Shapelets"]
