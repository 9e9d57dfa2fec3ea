"""Serving export: the jitted eval program serializes to a
self-contained StableHLO artifact (weights baked in) and a loader with
NO model code reproduces the exact detections (tools/export_serving.py).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"),
)

pytestmark = pytest.mark.slow


def test_export_roundtrip(tmp_path):
    from export_serving import export_model, load_and_run
    from test_generalized_rcnn import tiny_cfg

    from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector import (
        GeneralizedRCNN,
        statics_from_cfg,
    )

    cfg = tiny_cfg()
    model = GeneralizedRCNN(statics_from_cfg(cfg))
    h = w = 64
    images = jnp.asarray(
        np.random.RandomState(0).rand(1, h, w, 3), jnp.float32
    )
    sizes = jnp.array([[h, w]], jnp.int32)
    class_emb = jnp.asarray(
        np.random.RandomState(1).randn(8, 16), jnp.float32
    )
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, images, sizes, class_emb,
        train=False,
    )

    out_path = str(tmp_path / "m.stablehlo")
    manifest = export_model(cfg, params, class_emb, 1, h, w, out_path)
    assert manifest["bytes"] > 1000

    served = load_and_run(out_path, images, sizes)
    direct = model.apply(params, images, sizes, class_emb, train=False)

    np.testing.assert_array_equal(
        np.asarray(served["valid"]), np.asarray(direct.detections.valid)
    )
    np.testing.assert_allclose(
        np.asarray(served["boxes"]),
        np.asarray(direct.detections.boxes),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(served["scores"]),
        np.asarray(direct.detections.scores),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(served["mask_probs"]),
        np.asarray(direct.mask_probs),
        atol=1e-6,
    )
