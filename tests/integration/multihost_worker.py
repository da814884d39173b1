"""Worker process for the multi-host (DCN) distributed test.

Each worker is one "host" (jax process): it contributes 2 virtual CPU
devices, joins the jax.distributed coordination service, builds the GLOBAL
4-device mesh, and runs one sharded train step where the clip batch is
split across processes — the gradient psum therefore crosses the process
boundary (the DCN path of SURVEY.md §5: XLA collectives over the
distributed backend, no NCCL/MPI).

Usage: python multihost_worker.py <process_id> <num_processes> <port>
Prints one JSON line {"pid": i, "loss": float, "devices": n} on success.
"""

import json
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

sys.path.insert(0, __file__.rsplit("/", 3)[0])

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:  # cross-process CPU collectives ride gloo where available
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from vidmat.config import ModelConfig  # noqa: E402
from vidmat.models.weights import init_params  # noqa: E402
from vidmat.parallel.mesh import initialize_distributed, make_mesh  # noqa: E402
from vidmat.train.loop import (TrainState, make_optimizer,  # noqa: E402
                               make_train_step)

initialize_distributed(f"127.0.0.1:{port}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
n_dev = len(jax.devices())
assert n_dev == 2 * nproc, n_dev

mesh = make_mesh(("data",), (n_dev,))
repl = NamedSharding(mesh, P())
data_spec = P(None, "data", None, None, None)

cfg = ModelConfig()
t, n, h, w = 1, n_dev, 16, 32  # minimal: the test is about the DCN path,
# not the model — 1-frame clip keeps the BPTT compile small on CI hosts
variables = init_params(cfg, seed=0, height=h, width=w)  # same on all procs
optimizer = make_optimizer()
opt_state = optimizer.init(variables["params"])


def to_global(tree, spec):
    sh = NamedSharding(mesh, spec)

    def conv(a):
        a = np.asarray(a)
        return jax.make_array_from_process_local_data(sh, a)

    return jax.tree.map(conv, tree)


state = TrainState(variables=to_global(variables, P()),
                   opt_state=to_global(opt_state, P()), step=0)

# Each process holds ITS half of the batch; the global arrays are
# assembled across processes by sharding alone (true multi-host data
# loading — no process ever sees the full batch).
rng = np.random.RandomState(100 + pid)
local_n = n // nproc
clips_l = rng.rand(t, local_n, h, w, 3).astype(np.float32)
gta_l = rng.rand(t, local_n, h, w, 1).astype(np.float32)
gtf_l = rng.rand(t, local_n, h, w, 3).astype(np.float32)
dsh = NamedSharding(mesh, data_spec)
clips = jax.make_array_from_process_local_data(dsh, clips_l, (t, n, h, w, 3))
gta = jax.make_array_from_process_local_data(dsh, gta_l, (t, n, h, w, 1))
gtf = jax.make_array_from_process_local_data(dsh, gtf_l, (t, n, h, w, 3))

step_fn = make_train_step(cfg, optimizer, mesh=mesh)
state, metrics = step_fn(state, clips, gta, gtf)
loss = float(np.asarray(metrics["loss"].addressable_data(0)))
assert np.isfinite(loss), loss
print(json.dumps({"pid": pid, "loss": loss, "devices": n_dev}), flush=True)
