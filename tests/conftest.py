"""Test bootstrap: run everything on a virtual 8-device CPU mesh.

`XLA_FLAGS=--xla_force_host_platform_device_count=8` is the JAX-idiomatic
fake backend for exercising multi-device sharding without TPU hardware
(SURVEY.md §4). Must be set before jax initializes a backend.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
