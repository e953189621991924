from .metrics import (accuracy_cox, concordance_index, cox_log_rank,
                      extended_grading_metrics, grading_metrics)
