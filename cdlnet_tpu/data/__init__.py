from cdlnet_tpu.data.noise import awgn, awgn3d, gen_bayer_mask, gen_bayer_mask3d
from cdlnet_tpu.data.images import ImageDataset, get_data_loader, get_fit_loaders
from cdlnet_tpu.data.video import VideoClipDataset, get_video_loader, get_video_fit_loaders
from cdlnet_tpu.data.synthetic import (
    gen_synthetic_video_dirs,
    gen_synthetic_image_dirs,
    random_field_video,
)
from cdlnet_tpu.data.fastmri import (
    FastMRIDataset,
    get_fastmri_data_loader,
    get_fastmri_fit_loaders,
    ifft2c,
)
from cdlnet_tpu.data.loader import DataLoader
from cdlnet_tpu.data.prefetch import device_prefetch
