"""Test harness config: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run fast and without TPU hardware (SURVEY.md §4).

The session environment preloads jax via a sitecustomize hook and pins
``JAX_PLATFORMS=axon`` (remote TPU tunnel), so env-var overrides are too late
— ``jax.config.update`` is the only reliable way to select the CPU backend.
``XLA_FLAGS`` still applies because the CPU PJRT client is created lazily on
first use, after this conftest runs.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
