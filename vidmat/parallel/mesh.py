"""Device mesh construction (SURVEY.md §2.2, §5 distributed backend).

TPU-native scaling model: jax.sharding Mesh + NamedSharding; XLA emits the
collectives (all_gather / psum / halo ppermute) over ICI within a slice and
DCN across hosts via jax.distributed — no NCCL/MPI anywhere, their role is
fully subsumed (SURVEY.md §5).

Axes used by the framework:
  'stream'  — independent video streams (multi-stream serving, pure DP)
  'data'    — training clips (DP)
  'spatial' — frame width partitioning for very large frames (GSPMD spatial
              conv partitioning; the SP/CP analog for a conv net)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axis_names: Sequence[str] = ("stream",),
              shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """Build a mesh over available devices.

    shape None => all devices on the first axis, 1 elsewhere.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = [n] + [1] * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host init (DCN): thin wrapper over jax.distributed.initialize.

    On a single host this is a no-op; on a multi-host slice each process
    calls it before building the global mesh.
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
