from cdlnet_tpu.ops.conv import (
    conv2d,
    conv3d,
    conv_transpose2d,
    conv_transpose3d,
)
from cdlnet_tpu.ops.lista import lista_2d, lista_3d
