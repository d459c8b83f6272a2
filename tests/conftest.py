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

# Persistent compilation cache, keyed by the host's CPU feature set:
# XLA:CPU AOT executables segfault when loaded on a machine with
# different vector extensions than the compile machine (observed when
# /tmp survived across heterogeneous sandbox hosts), so entries must
# never cross machines.
import hashlib

_flags = ""
try:
    with open("/proc/cpuinfo") as _fh:
        for _line in _fh:
            if _line.startswith("flags"):
                _flags = _line.strip()
                break
except OSError:
    pass
_key = hashlib.sha1(_flags.encode()).hexdigest()[:12]
jax.config.update("jax_compilation_cache_dir", f"/tmp/sczk_jax_cache_{_key}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
