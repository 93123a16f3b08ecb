"""Test harness: force an 8-device virtual CPU platform so sharding /
multi-chip code paths are exercised without TPU hardware (the standard JAX
pattern; see SURVEY.md §4).

Note: this environment preloads jax at interpreter startup (sitecustomize),
so JAX_PLATFORMS in os.environ is too late — we must flip the platform via
jax.config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the test box is a single CPU core, so
# repeated tiny-model compiles dominate suite time; cache them across runs.
from vidtome_tpu.runtime import setup_compilation_cache  # noqa: E402

setup_compilation_cache(os.path.expanduser("~/.cache/vidtome_test_xla"))
