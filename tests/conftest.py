"""Test config: force CPU with 8 virtual devices so multi-chip sharding paths
are exercised without TPU hardware (mirrors how the driver dry-runs
``dryrun_multichip``)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# NOTE: the axon TPU plugin ignores the JAX_PLATFORMS env var; only the config
# API reliably forces CPU. Must run before any backend initialization.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from transformers4rec_tpu.data.synthetic import (  # noqa: E402
    synthetic_data,
    synthetic_ecommerce_data_schema,
)


@pytest.fixture(scope="session")
def ecommerce_schema():
    return synthetic_ecommerce_data_schema(num_items=1000, num_categories=50, max_session_length=20)


@pytest.fixture(scope="session")
def yoochoose_like_batch(ecommerce_schema):
    """Dense synthetic batch analog of the reference's torch_yoochoose_like fixture
    (/root/reference/tests/unit/torch/_conftest.py:162-166)."""
    return synthetic_data(ecommerce_schema, num_rows=100, max_session_length=20, seed=1)


@pytest.fixture(scope="session")
def ragged_batch(ecommerce_schema):
    return synthetic_data(ecommerce_schema, num_rows=100, max_session_length=20, ragged=True, seed=1)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
