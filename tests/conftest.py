"""Test environment: forced-CPU JAX with 8 virtual devices.

Per SURVEY.md §4: the local box has one real TPU chip (and TPU compile is
slow), so unit tests run on the CPU backend with
``--xla_force_host_platform_device_count=8`` to exercise every mesh/sharding
path at mesh sizes {1, 2, 8}. Pallas kernels are tested in interpreter mode
here; compiled-kernel parity runs on the real chip via bench.py.

This must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
