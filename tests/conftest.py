"""Test configuration: force the CPU backend with a virtual 8-device mesh.

The test suite validates protocol correctness and multi-chip sharding
without TPU hardware (the driver separately dry-runs the multi-chip path
and benches on a real chip).  The axon sitecustomize hook pins
``jax_platforms`` to "axon,cpu"; we override it back to CPU here, before
any backend is initialized.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

# NOTE: the persistent compilation cache is deliberately DISABLED.
# On this host XLA:CPU executable (de)serialization is unreliable: loads
# segfault when entries were AOT-compiled under different CPU features,
# and writes segfault in put_executable_and_time for some executables.
# Compile time is paid once per process instead (the suite runs in one).
