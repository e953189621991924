from .aekd import (aekd_scale, aekd_total, aekd_v2_gate, feature_grads,
                   gk_refine_thresh_weights, momentum_scale_update)
