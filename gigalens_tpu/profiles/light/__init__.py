from gigalens_tpu.profiles.light.sersic import CoreSersic, Sersic, SersicEllipse

__all__ = ["Sersic", "SersicEllipse", "CoreSersic"]
