"""Test session config: force an 8-virtual-device CPU JAX backend.

Per SURVEY.md §4, mesh/sharding tests run deterministically on a fake
8-device CPU platform; kernels are parity-tested on the same backend
(the real TPU chip is exercised by bench.py, not the unit suite).
Must run before anything imports jax.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
