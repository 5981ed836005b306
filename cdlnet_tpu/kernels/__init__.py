from cdlnet_tpu.kernels.lista2d import (
    lista2d_fused,
    lista2d_fused_supported,
)
