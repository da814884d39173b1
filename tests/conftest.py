"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-device tests without a cluster use XLA's host-platform device-count
flag (SURVEY.md §4). The ambient environment registers the axon TPU tunnel
and pins the platform to it regardless of JAX_PLATFORMS, so we must override
via jax.config before any backend is initialized. bench.py is the only TPU
entry point; tests are CPU-only by design (fast, deterministic).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
