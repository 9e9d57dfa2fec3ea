"""Test configuration: force an 8-device virtual CPU platform so
multi-chip sharding logic is exercised without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize registers the remote "axon" TPU backend
# regardless of JAX_PLATFORMS; force the virtual-device CPU platform
# explicitly so the suite never compiles over the TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)


# ---------------------------------------------------------------------------
# Fast/slow tiers: the modules below jit full models (30s-4min each on
# the 8-virtual-device CPU backend).  Fast tier: pytest -m "not slow"
# (~5 min); full suite stays the default.  See docs/testing.md.
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

SLOW_MODULES = {
    "test_overfit",
    "test_train_step",
    "test_generalized_rcnn",
    "test_mmss",
    "test_freeze_stopgrad",
    "test_st_model",
    "test_fpn_path",
    "test_inference_pipeline",
    "test_golden_pins",
    "test_retinanet",
    "test_keypoint_wsddn",
    "test_dcn_backbone",
    "test_bbox_aug_driver",
    "test_multidevice_equivalence",
    "test_cli_resume",
    "test_cli_pipeline",
    "test_baselines",
    "test_uncertainty_efficacy",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
