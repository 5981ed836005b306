from cdlnet_tpu.dist.mesh import make_mesh
from cdlnet_tpu.dist.sharding import (
    batch_sharding,
    replicate_sharding,
    make_dp_train_step,
)
from cdlnet_tpu.dist.halo import halo_exchange, sharded_lista_3d_forward
