from cdlnet_tpu.compat.torch_ckpt import (
    load_torch_checkpoint,
    import_net_state,
    export_net_state,
    save_torch_checkpoint,
)
