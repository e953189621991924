from .tsvt import tensor_nuclear_norm, update_aux
from .views import build_view_features, update_adj_tensor
