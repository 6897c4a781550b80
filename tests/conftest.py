"""Test configuration: force an 8-virtual-device CPU backend.

Multi-chip sharding logic is tested without hardware on 8 virtual CPU
devices (SURVEY.md §4c) — the fake-backend capability the reference lacks.
Pallas kernels run through the interpreter on CPU (utils/platform.py
resolves ``interpret=None`` to True).

Note: something on this image imports jax as a pytest-plugin side effect
*before* conftest runs, so env vars (JAX_PLATFORMS / XLA_FLAGS) are too late;
``jax.config.update`` still works because the backend is not yet initialized.
Tests must not run against the tunneled TPU backend — it is orders of
magnitude too slow for a suite.
"""

import os

os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
