"""Multi-host (DCN) distributed backend test (SURVEY.md §5, VERDICT round 1
"multi-host backend untested").

Spawns 2 separate OS processes that each contribute 2 virtual CPU devices,
join a jax.distributed coordination service on localhost, and run ONE
sharded train step over the GLOBAL 4-device mesh with the batch split
across processes. The gradient reduction therefore crosses the process
boundary — exercising the same XLA-collectives-over-distributed-backend
path a real multi-host TPU slice uses over DCN (with TCP standing in for
the fabric).

Both processes must agree on the (replicated) loss bit-for-bit: the psum
result is deterministic and replicated to every process.
"""

import pytest as _pytest_tier

# Full-tier only (tests/README.md): compile-heavy mesh/interpret
# programs, process spawns, long rollouts, or e2e conversions.
pytestmark = _pytest_tier.mark.slow


import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_train_step():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host worker timed out")
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    assert {o["pid"] for o in outs} == {0, 1}
    assert all(o["devices"] == 4 for o in outs)
    # psum-reduced loss is replicated: both hosts see the identical value
    assert outs[0]["loss"] == outs[1]["loss"], outs


SERVE_WORKER = os.path.join(os.path.dirname(__file__),
                            "multihost_serve_worker.py")


def test_two_process_distributed_serving():
    """Multi-host SERVING: 4 streams shard_map'd over a 4-device mesh
    spanning 2 OS processes, real Pallas serving body per device
    (interpret kernels). Each process asserts in-worker that its streams'
    meshed outputs are bit-identical to an unmeshed local reference —
    steady-state multi-stream serving is communication-free, so crossing
    the process boundary must not change a byte."""
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, SERVE_WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host serve worker timed out")
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    assert {o["pid"] for o in outs} == {0, 1}
    assert all(o["ok"] for o in outs)
