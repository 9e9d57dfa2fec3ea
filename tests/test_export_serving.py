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


def test_export_cli_main(tmp_path, monkeypatch):
    """Drives export_serving.main() end-to-end: dataset-list handling,
    keyword class-embedding init, and orbax training-checkpoint loading
    (all three once crashed — the in-process tests above never reached
    main())."""
    import json
    import subprocess

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ASSETS = os.path.join(REPO, ".claude", "skills", "verify", "assets")
    cfg_path = os.path.join(ASSETS, "tiny_zs.yaml")
    if not os.path.exists(cfg_path):
        pytest.skip("verify assets missing")
    subprocess.run(
        [sys.executable, os.path.join(ASSETS, "gen_coco.py")], check=True
    )
    monkeypatch.setenv("CMPL_TPU_DATA_DIR", "/tmp/verify_st/data")

    from cvpr22_cross_modal_pseudo_labeling_tpu.config import (
        get_default_cfg,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.checkpoint import (
        save_checkpoint,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector import (
        build_detection_model,
    )

    cfg = get_default_cfg()
    cfg.merge_from_file(cfg_path)
    model = build_detection_model(cfg)
    h = w = 64
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, h, w, 3), jnp.float32),
        jnp.array([[h, w]], jnp.int32),
        class_embeddings=jnp.zeros(
            (3, cfg.MODEL.ROI_BOX_HEAD.EMB_DIM), jnp.float32
        ),
        train=False,
    )
    ckpt_dir = str(tmp_path / "ck")
    save_checkpoint(
        ckpt_dir, {"state": {"params": variables}, "iteration": 1}, 1
    )

    out_path = str(tmp_path / "m.stablehlo")
    monkeypatch.setattr(
        sys, "argv",
        ["export_serving.py", "--config-file", cfg_path,
         "--ckpt", os.path.join(ckpt_dir, "model_0000001"),
         "--out", out_path,
         "--height", str(h), "--width", str(w)],
    )
    from export_serving import main

    main()
    manifest = json.load(open(out_path + ".json"))
    assert manifest["bytes"] > 1000
    assert os.path.getsize(out_path) == manifest["bytes"]
