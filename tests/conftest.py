"""Test configuration: hermetic, TPU-free.

Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
paths (reve_tpu.parallel) are exercised without a TPU pod — the strategy
SURVEY.md §4 prescribes for the rebuild.

Note: this environment pre-imports jax via a sitecustomize with
JAX_PLATFORMS=axon, so plain env vars are too late; jax.config.update works
because XLA backends initialize lazily (on first device query).
"""

import os

# tests run hermetically with no model weights on disk: opt into the
# deterministic random-init fallback (the product default REFUSES to run
# without weights — tests of that refusal unset this via monkeypatch)
os.environ.setdefault("REVE_TPU_ALLOW_RANDOM_INIT", "1")

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_seed():
    return 0
