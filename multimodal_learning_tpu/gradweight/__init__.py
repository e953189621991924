from .aekd import (aekd_scale, aekd_total, aekd_v2_gate, feature_grads,
                   gk_refine_param_space, gk_refine_thresh_weights,
                   momentum_aekd_scale)
