import numpy as np
import pytest

from cvpr22_cross_modal_pseudo_labeling_tpu.engine.checkpoint import (
    apply_reference_key_surgery,
    import_torch_state_dict,
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)


def small_params():
    return {
        "backbone": {
            "body": {
                "stem": {
                    "conv1": {"kernel": np.zeros((7, 7, 3, 64), np.float32)},
                    "bn1": {
                        "frozen_bn_weight": np.zeros(64, np.float32),
                        "frozen_bn_bias": np.zeros(64, np.float32),
                        "frozen_bn_mean": np.zeros(64, np.float32),
                        "frozen_bn_var": np.ones(64, np.float32),
                    },
                },
                "layer1": {
                    "block0": {
                        "conv1": {
                            "kernel": np.zeros((1, 1, 64, 64), np.float32)
                        },
                        "downsample_conv": {
                            "kernel": np.zeros((1, 1, 64, 256), np.float32)
                        },
                    }
                },
            }
        },
        "box_predictor": {
            "emb_pred": {
                "kernel": np.zeros((2048, 768), np.float32),
                "bias": np.zeros(768, np.float32),
            }
        },
    }


def test_import_torch_state_dict_maps_and_transposes():
    params = small_params()
    rng = np.random.RandomState(0)
    sd = {
        "backbone.body.stem.conv1.weight": rng.randn(64, 3, 7, 7).astype(
            np.float32
        ),
        "backbone.body.stem.bn1.weight": rng.randn(64).astype(np.float32),
        "backbone.body.stem.bn1.running_mean": rng.randn(64).astype(
            np.float32
        ),
        "backbone.body.layer1.0.conv1.weight": rng.randn(
            64, 64, 1, 1
        ).astype(np.float32),
        "backbone.body.layer1.0.downsample.0.weight": rng.randn(
            256, 64, 1, 1
        ).astype(np.float32),
        "roi_heads.box.predictor.emb_pred.weight": rng.randn(
            768, 2048
        ).astype(np.float32),
        "roi_heads.box.predictor.emb_pred.bias": rng.randn(768).astype(
            np.float32
        ),
    }
    new_params, report = import_torch_state_dict(params, sd)
    assert report["matched"] == len(sd)
    # conv OIHW -> HWIO
    np.testing.assert_allclose(
        new_params["backbone"]["body"]["stem"]["conv1"]["kernel"],
        sd["backbone.body.stem.conv1.weight"].transpose(2, 3, 1, 0),
    )
    # frozen BN leaves
    np.testing.assert_allclose(
        new_params["backbone"]["body"]["stem"]["bn1"]["frozen_bn_mean"],
        sd["backbone.body.stem.bn1.running_mean"],
    )
    # linear transpose
    np.testing.assert_allclose(
        new_params["box_predictor"]["emb_pred"]["kernel"],
        sd["roi_heads.box.predictor.emb_pred.weight"].T,
    )
    # downsample.0 -> downsample_conv
    np.testing.assert_allclose(
        new_params["backbone"]["body"]["layer1"]["block0"][
            "downsample_conv"
        ]["kernel"],
        sd["backbone.body.layer1.0.downsample.0.weight"].transpose(
            2, 3, 1, 0
        ),
    )


def test_key_surgery():
    sd = {
        "module.backbone.body.stem.conv1.weight": np.zeros(1),
        "mmss_heads.GroundingHead.v2l_projection.weight": np.zeros(1),
        "roi_heads.box.predictor.cls_score.weight": np.zeros(1),
        "body.layer1.0.conv1.weight": np.zeros(1),
    }
    out = apply_reference_key_surgery(
        sd,
        backbone_prefix="body.",
        load_emb_pred_from_mmss_head=True,
        default_mmss_head="GroundingHead",
        load_classifier=False,
    )
    assert "backbone.body.stem.conv1.weight" in out
    assert "roi_heads.box.predictor.emb_pred.weight" in out
    assert not any("cls_score" in k for k in out)
    assert "backbone.body.layer1.0.conv1.weight" in out


def test_orbax_roundtrip(tmp_path):
    state = {
        "state": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "iteration": 7,
    }
    path = save_checkpoint(str(tmp_path), state, 7)
    assert latest_checkpoint(str(tmp_path)) == path
    restored = load_checkpoint(
        path, {"state": {"w": np.zeros((2, 3), np.float32)}, "iteration": 0}
    )
    np.testing.assert_allclose(restored["state"]["w"], state["state"]["w"])
    assert int(restored["iteration"]) == 7
