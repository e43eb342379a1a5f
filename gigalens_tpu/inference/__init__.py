from gigalens_tpu.inference.hmc import (
    HMCResult,
    clear_program_caches,
    fit_hmc,
    sample_hmc,
)
from gigalens_tpu.inference.map import best_start, fit_map
from gigalens_tpu.inference.sequence import ModellingSequence
from gigalens_tpu.inference.smc import SMCResult, fit_smc
from gigalens_tpu.inference.survey import SurveySequence
from gigalens_tpu.inference.svi import (
    fit_svi,
    fit_svi_survey,
    importance_evidence,
    importance_evidence_survey,
)

__all__ = [
    "ModellingSequence",
    "SurveySequence",
    "fit_map",
    "best_start",
    "fit_svi",
    "fit_svi_survey",
    "importance_evidence",
    "importance_evidence_survey",
    "fit_hmc",
    "sample_hmc",
    "HMCResult",
    "fit_smc",
    "SMCResult",
    "clear_program_caches",
]
