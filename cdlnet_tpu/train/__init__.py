from cdlnet_tpu.train.losses import mse_loss, mcsure_loss, ssim, combined_loss
from cdlnet_tpu.train.optim import make_optimizer, steplr_value
from cdlnet_tpu.train.checkpoint import save_ckpt, load_ckpt, save_args
from cdlnet_tpu.train.fit import fit, init_model
