"""Test configuration: force the CPU backend with 8 virtual devices.

Multi-chip sharding is validated the standard JAX way (SURVEY.md section 4,
item 4): an 8-device host-platform mesh stands in for a pod slice. The axon
TPU plugin registers itself via sitecustomize and pins jax_platforms, so we
must override the config programmatically before any computation runs.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# NOTE: the persistent compilation cache is deliberately NOT enabled: this
# image's XLA:CPU AOT loader rejects its own cache entries with machine-
# feature mismatch errors (cpu_aot_loader.cc) and warns about SIGILL.

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
