from gigalens_tpu.profiles.base import (
    LightProfile,
    MassProfile,
    Parameterized,
)

__all__ = ["LightProfile", "MassProfile", "Parameterized"]
