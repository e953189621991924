from .coxph import fit_coxph, predict_partial_hazard, train_cox_cv
from .metrics import (accuracy_cox, concordance_index, cox_log_rank,
                      extended_grading_metrics, grading_metrics)
