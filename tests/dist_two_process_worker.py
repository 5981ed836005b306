"""Worker for test_dist_multiprocess: one of two cooperating processes.

Runs the REAL multi-process runtime path (jax.distributed.initialize over
a localhost coordinator, Gloo CPU collectives) through the package's own
surface: dist.init.initialize_distributed -> dist.mesh.make_mesh over the
4 global devices (2 per process) -> dist.sharding.make_dp_train_step with
prepare()'s cross-process device_put. Prints a parseable checksum line the
launching test compares across ranks and against the unsharded step.

Usage: python dist_two_process_worker.py <process_id> <coordinator_port>
"""

import os
import sys

pid, port = int(sys.argv[1]), sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from cdlnet_tpu.dist.init import initialize_distributed  # noqa: E402

assert initialize_distributed(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cdlnet_tpu.dist.mesh import make_mesh  # noqa: E402
from cdlnet_tpu.dist.sharding import make_dp_train_step  # noqa: E402
from cdlnet_tpu.models import build_model  # noqa: E402
from cdlnet_tpu.train.optim import make_optimizer  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from dist_two_process_case import CASE, loss_for  # noqa: E402

model = build_model(CASE["mtype"], CASE["model"])
params = model.init(jax.random.PRNGKey(0), init=False)
opt = make_optimizer(1e-3, clip_grad=1.0)
ostate = opt.init(params)
mesh = make_mesh({"data": -1})
assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2

rng = np.random.default_rng(0)
x = rng.uniform(size=CASE["batch"]).astype(np.float32)
y = (x + 0.1 * rng.standard_normal(x.shape)).astype(np.float32)

step, prepare = make_dp_train_step(model, opt, loss_for(model), mesh)
params, ostate, batch = prepare(params, ostate, (y, x))
for i in range(CASE["steps"]):
    params, ostate, loss = step(params, ostate, batch, jax.random.PRNGKey(i))
ck = sum(float(jnp.sum(jnp.abs(v))) for v in jax.tree_util.tree_leaves(params))
print(f"CHECKSUM {pid} {ck:.8f} LOSS {float(loss):.10f}", flush=True)

# depth-halo sequence parallelism over the same 2-process mesh: the halo
# ppermute crosses the process boundary (Gloo), unlike the virtual-mesh test
from jax.sharding import NamedSharding, PartitionSpec as Pspec  # noqa: E402

from cdlnet_tpu.dist.halo import sharded_lista_3d_forward  # noqa: E402
from cdlnet_tpu.dist.mesh import make_mesh as _mm  # noqa: E402

vmodel = build_model(CASE["vmtype"], CASE["vmodel"])
vparams = vmodel.init(jax.random.PRNGKey(0), init=False)
vparams = {k: v * 0.1 if k in ("A", "B") else jnp.abs(v) + 0.01
           for k, v in vparams.items()}
dmesh = make_mesh({"depth": -1})
clip = rng.uniform(size=CASE["clip"]).astype(np.float32)
clip_s = jax.device_put(
    jnp.asarray(clip), NamedSharding(dmesh, Pspec(None, None, "depth")))
xhat, _ = sharded_lista_3d_forward(vmodel, vparams, clip_s, 25.0, mesh=dmesh)
hck = float(jnp.sum(jnp.abs(xhat)))
print(f"HALOSUM {pid} {hck:.6f}", flush=True)
