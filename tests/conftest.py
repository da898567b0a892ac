"""Test environment: forced-CPU JAX with 8 virtual devices.

Per SURVEY.md §4: the local box has one real TPU chip (and TPU compile is
slow), so unit tests run on the CPU backend with 8 virtual devices to
exercise every mesh/sharding path at mesh sizes {1, 2, 8}. Pallas kernels
are tested in interpreter mode here; compiled-kernel parity runs on the real
chip via bench.py and the verify drive.

The container's sitecustomize registers the ``axon`` TPU plugin at
interpreter startup and forces jax_platforms=axon, overriding the
JAX_PLATFORMS env var — so this conftest must override the *config* after
import, before any backend is initialized.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Tests generate many tiny synthetic datasets; keep them out of the
# run-scale disk cache (tests that exercise the cache use tmp_path).
os.environ["HASHGAN_SYNTH_CACHE"] = "off"
