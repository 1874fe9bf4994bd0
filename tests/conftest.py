"""Test bootstrap: run everything on a virtual 8-device CPU mesh.

`--xla_force_host_platform_device_count=8` is the JAX-idiomatic fake backend
for exercising multi-device sharding without TPU hardware (SURVEY.md §4).

The environment may pre-register a TPU backend at interpreter startup (e.g.
an axon sitecustomize) and pin JAX_PLATFORMS, so env vars alone are not
enough — `jax.config.update` forces the platform after import, before any
backend is used.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
