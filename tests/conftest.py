"""Test configuration: force an 8-device virtual CPU mesh with x64 numerics.

Multi-chip TPU hardware is unavailable in CI; sharding tests run against
XLA's host-platform device emulation instead (SURVEY §4 test-strategy item 5).

NOTE: this environment's sitecustomize force-registers the 'axon' TPU plugin
and rewrites jax_platforms, so the JAX_PLATFORMS env var alone is NOT enough —
we must override the config after importing jax, before any backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# GGP_TEST_TPU=1: keep the real backend so `pytest -m tpu` validates the
# fused Mosaic kernels on hardware (interpret mode cannot catch relayout/
# lowering failures, CLAUDE.md). Default: forced CPU, x64, 8 virtual devices.
_TPU_LANE = os.environ.get("GGP_TEST_TPU") == "1"
if not _TPU_LANE:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


def pytest_configure(config):
    if _TPU_LANE:
        return
    assert jax.default_backend() == "cpu", (
        f"tests must run on CPU, got {jax.default_backend()}")
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


def pytest_collection_modifyitems(config, items):
    on_tpu = jax.default_backend() == "tpu"
    skip_tpu = pytest.mark.skip(
        reason="needs real TPU (GGP_TEST_TPU=1 pytest -m tpu)")
    for item in items:
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(skip_tpu)


@pytest.fixture
def rng():
    return np.random.default_rng(173)
