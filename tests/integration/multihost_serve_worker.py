"""Worker process for the multi-host SERVING test.

Each worker is one "host" (jax process) contributing 2 virtual CPU
devices; together they form a 4-device ('stream',) mesh serving 4
independent streams — the SURVEY.md §3.4 multi-stream topology spread
across a process boundary (DCN stand-in), with the REAL Pallas serving
body (interpret mode) running per-device inside jax.shard_map.

Each process also serves ITS OWN 2 streams with an identical unmeshed
local body and asserts the meshed outputs match bit-for-bit: steady-state
multi-stream serving is communication-free, so distribution must not
change a single byte.

Usage: python multihost_serve_worker.py <pid> <nproc> <port>
Prints one JSON line {"pid": i, "ok": true, "sum": int} on success.
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
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from vidmat.config import ModelConfig, RefineConfig  # noqa: E402
from vidmat.models.matting_net import MattingNetwork  # noqa: E402
from vidmat.models.weights import init_params  # noqa: E402
from vidmat.parallel.mesh import initialize_distributed, make_mesh  # noqa: E402
from vidmat.pipeline.stepfactory import build_serving_body  # noqa: E402

initialize_distributed(f"127.0.0.1:{port}", nproc, pid)
n_dev = len(jax.devices())
assert n_dev == 2 * nproc, n_dev
S, h, w = n_dev, 64, 64
local_s = S // nproc

cfg = ModelConfig(conv_impl="planar")
variables = init_params(cfg, seed=0)  # identical on every process
net = MattingNetwork(cfg, dtype=jnp.float32)
kw = dict(cdtype=jnp.float32, bg=jnp.asarray([0.1, 0.6, 0.2]),
          use_pallas=True, pallas_interpret=True)
body, plan = build_serving_body(net, cfg, RefineConfig(), h, w, 0.5, **kw)
assert plan.packed


def frame_step(variables, frames_u8, state, reset_mask):
    keep = 1.0 - reset_mask.astype(jnp.float32)
    state = jax.tree_util.tree_map(
        lambda s: s * keep.reshape((-1,) + (1,) * (s.ndim - 1)), state)
    return body(variables, frames_u8, state)


mesh = make_mesh(("stream",), (n_dev,))
rep, sh = P(), P("stream")
meshed = jax.jit(jax.shard_map(frame_step, mesh=mesh,
                               in_specs=(rep, sh, sh, sh),
                               out_specs=(sh, sh), check_vma=False))
local = jax.jit(frame_step)


def to_global(local_arr, spec):
    shd = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(shd, local_arr)


# Per-stream deterministic frames: stream s uses seed 1000+s, so both the
# meshed run and the local reference regenerate identical inputs.
def stream_frames(s, t):
    return np.random.RandomState(1000 + 37 * s + t).randint(
        0, 255, (h, w, 3), np.uint8)


# Global (S, ...) state assembled from each process's local (S/nproc, ...)
# zeros — no process ever materializes the full state.
state = jax.tree_util.tree_map(
    lambda z: to_global(np.asarray(z), P("stream")),
    plan.make_state(local_s))
ref_state = plan.make_state(local_s)

my_streams = list(range(pid * local_s, (pid + 1) * local_s))
checksum = 0
for t in range(3):
    frames_l = np.stack([stream_frames(s, t) for s in my_streams])
    reset_l = np.zeros((local_s,), np.float32)
    if t == 1:
        reset_l[::2] = 1.0  # mid-run scene cuts on even local slots
    fg = to_global(frames_l, P("stream"))
    rg = to_global(reset_l, P("stream"))
    out, state = meshed(variables, fg, state, rg)
    ref_out, ref_state = local(variables, jnp.asarray(frames_l),
                               ref_state, jnp.asarray(reset_l))

    # Gather this process's shards in global stream order.
    shards = sorted(out.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    mine = np.concatenate([np.asarray(s.data) for s in shards])
    ref = np.asarray(ref_out)
    assert mine.shape == ref.shape == (local_s, h, w), (mine.shape,
                                                        ref.shape)
    np.testing.assert_array_equal(mine, ref)
    checksum ^= int(np.bitwise_xor.reduce(mine, axis=None))

print(json.dumps({"pid": pid, "ok": True, "sum": checksum}), flush=True)
