"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require TPU hardware; multi-chip sharding paths are exercised on
a virtual CPU mesh (``xla_force_host_platform_device_count=8``), matching the
driver's multi-chip dry-run environment. Must run before jax is imported.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the image's axon TPU plugin force-appends itself to jax_platforms; pin CPU
# explicitly so tests never grab the (single) tunneled TPU chip.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


# ---------------------------------------------------------------------------
# slow-test auto-marking (duration-driven; see pytest.ini). The smoke subset
# `pytest -m "not slow"` stays under ~2 min; the full suite is ~25 min.
# ---------------------------------------------------------------------------

_SLOW = (
    "test_train_variants.py",
    "test_train_e2e.py",
    "test_uda.py",
    "test_parallel.py",
    "test_backends_extra.py",
    "test_export.py",
    "test_dcn_pooling.py",
    "test_torch_import.py",
    "test_dla.py::test_dla_train_step_grads",
    "test_dla.py::test_trunk_level_shapes",
    "test_dla.py::test_dlaseg_head_contract",
    "test_dla.py::test_hm_bias_init",
    "test_dla.py::test_s2d_stem_matches_plain_stem",
    "test_dcn_pallas.py::test_non_divisible_height",
    "test_dcn_pallas.py::test_backward_matches_clamped_xla",
    "test_dcn_pallas.py::test_matches_xla_within_clamp",
    "test_dcn_pallas.py::test_lane_packed_small_maps",
    "test_dcn_pallas.py::test_wide_maps",
    "test_dcn_pallas.py::test_wide_map_fused_backward_select",
    "test_dcn_pallas.py::test_large_cin_select",
    "test_dcn_pallas.py::test_bf16_input_select",
    "test_dcn_pallas.py::test_clamp_semantics",
    "test_dcn_pallas.py::test_zero_offsets_exact_structure",
    "test_multihost.py",
    "test_reference_parity.py",
    "test_models.py::TestResNet",
    "test_dcn.py::test_gradcheck",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(s in item.nodeid for s in _SLOW):
            item.add_marker(pytest.mark.slow)
