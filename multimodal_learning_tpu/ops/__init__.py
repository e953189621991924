from .kron_fusion import kron_matmul
