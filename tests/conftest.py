"""Test harness.

Default tier: CPU backend with 8 virtual devices (fast compiles, multi-device
sharding tests without TPU hardware — SURVEY.md §4) and x64 enabled so
complex128 oracle comparisons are exact.

TPU tier (VERDICT r1 #4): ``MAUS_TPU_TESTS=1 pytest -m tpu tests/test_tpu.py``
leaves the pre-registered TPU backend in place and runs the hardware-marked
tests (c64 numerics, xfer shims, checkpoint round-trip on the chip). x64 stays
ON for split-f64 refinement; complex128 never reaches the device.

Note: this environment registers a TPU backend via sitecustomize before pytest
starts, so the CPU switch must go through ``jax.config`` (env vars are read
too early).
"""
import os

import jax

if os.environ.get("MAUS_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
