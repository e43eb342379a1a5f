from gigalens_tpu.prob import bijectors, distributions
from gigalens_tpu.prob.prior import Prior

__all__ = ["bijectors", "distributions", "Prior"]
