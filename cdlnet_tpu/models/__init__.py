from cdlnet_tpu.models.base import build_model, MODEL_REGISTRY
from cdlnet_tpu.models.cdlnet import CDLNet
from cdlnet_tpu.models.cdlnet_video import CDLNetVideo
from cdlnet_tpu.models.gdlnet import GDLNet
from cdlnet_tpu.models.csr import CDLNetCSR, CDLNetCSRf2
from cdlnet_tpu.models.dncnn import DnCNN, FFDNet
from cdlnet_tpu.models.streaming import denoise_long_video
