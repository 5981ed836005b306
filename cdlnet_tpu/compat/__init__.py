from cdlnet_tpu.compat.torch_ckpt import (
    load_torch_checkpoint,
    import_net_state,
    export_net_state,
    save_torch_checkpoint,
    param_order,
    import_opt_state,
    export_opt_state,
    import_sched_state,
    export_sched_state,
)
