from cdlnet_tpu.kernels.lista2d import (
    lista2d_fused,
    lista2d_fused_supported,
)
from cdlnet_tpu.kernels.lista3d import (
    lista3d_fused,
    lista3d_fused_supported,
)
