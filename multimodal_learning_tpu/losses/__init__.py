from .task import cox_loss, l1_regularizer, nll_loss
from .kd import distill_kl, pred_kd_loss, sp_loss
from .orth import orth_loss
from .supcon import supcon_loss
