from cdlnet_tpu.core.pad import (
    calc_pad_1d,
    calc_pad_2d,
    calc_pad_3d,
    unpad,
    unpad_3d,
    conv_pad,
)
from cdlnet_tpu.core.ops import ST, prox_csr, prox_csr_f2, uball_project
from cdlnet_tpu.core.preprocess import (
    pre_process,
    post_process,
    pre_process_3d,
    post_process_3d,
)
from cdlnet_tpu.core.solvers import power_method
from cdlnet_tpu.core.gabor import gabor_kernel
from cdlnet_tpu.core import wavelet
