"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the survey's test strategy (SURVEY.md §4): correctness tests run on
CPU so they are hermetic and fast; multi-chip sharding is validated with
``--xla_force_host_platform_device_count=8``. Benchmarks (bench.py) run on
the real TPU instead.

Note: this environment preimports jax via sitecustomize with the TPU
platform already selected, so the platform must be switched through
``jax.config`` (env vars are read once at import time).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
