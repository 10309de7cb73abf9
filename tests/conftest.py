"""Test harness: CPU backend with 8 virtual devices (fast compiles, multi-device
sharding tests without TPU hardware — SURVEY.md §4) and x64 enabled so complex128
oracle comparisons are exact.

Note: this environment registers a TPU backend via sitecustomize before pytest
starts, so the switch must go through ``jax.config`` (env vars are read too early).
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
