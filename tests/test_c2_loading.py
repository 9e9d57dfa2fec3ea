import pickle

import numpy as np

from cvpr22_cross_modal_pseudo_labeling_tpu.engine.c2_loading import (
    import_c2_imagenet_weights,
    load_c2_pickle,
    translate_c2_names,
)


def test_translate_c2_names():
    blobs = {
        "conv1_w": np.zeros((64, 3, 7, 7)),
        "res_conv1_bn_s": np.ones(64),
        "res_conv1_bn_b": np.zeros(64),
        "res2_0_branch2a_w": np.zeros((64, 64, 1, 1)),
        "res2_0_branch2a_bn_s": np.ones(64),
        "res2_0_branch2a_bn_b": np.zeros(64),
        "res2_0_branch1_w": np.zeros((256, 64, 1, 1)),
        "res2_0_branch1_bn_s": np.ones(256),
        "pred_w": np.zeros((1000, 2048)),  # classifier head: dropped
    }
    out = translate_c2_names(blobs)
    assert "backbone.body.stem.conv1.weight" in out
    assert "backbone.body.stem.bn1.weight" in out
    assert "backbone.body.layer1.0.conv1.weight" in out
    assert "backbone.body.layer1.0.bn1.weight" in out
    # synthesized identity stats
    assert "backbone.body.layer1.0.bn1.running_var" in out
    np.testing.assert_allclose(
        out["backbone.body.layer1.0.bn1.running_var"], 1.0
    )
    assert "backbone.body.layer1.0.downsample.0.weight" in out
    assert "backbone.body.layer1.0.downsample.1.weight" in out
    assert not any("pred" in k for k in out)


def test_import_c2_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    blobs = {
        "conv1_w": rng.randn(8, 3, 7, 7).astype(np.float32),
        "res_conv1_bn_s": rng.rand(8).astype(np.float32),
        "res_conv1_bn_b": rng.randn(8).astype(np.float32),
    }
    p = tmp_path / "R-50.pkl"
    with open(p, "wb") as f:
        pickle.dump({"blobs": blobs}, f)
    assert "conv1_w" in load_c2_pickle(str(p))

    params = {
        "backbone": {
            "body": {
                "stem": {
                    "conv1": {"kernel": np.zeros((7, 7, 3, 8), np.float32)},
                    "bn1": {
                        "frozen_bn_weight": np.zeros(8, np.float32),
                        "frozen_bn_bias": np.zeros(8, np.float32),
                        "frozen_bn_mean": np.ones(8, np.float32),
                        "frozen_bn_var": np.zeros(8, np.float32),
                    },
                }
            }
        }
    }
    new_params, report = import_c2_imagenet_weights(params, str(p))
    np.testing.assert_allclose(
        new_params["backbone"]["body"]["stem"]["conv1"]["kernel"],
        blobs["conv1_w"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        new_params["backbone"]["body"]["stem"]["bn1"]["frozen_bn_weight"],
        blobs["res_conv1_bn_s"],
    )
    # identity stats: mean 0, var 1
    np.testing.assert_allclose(
        new_params["backbone"]["body"]["stem"]["bn1"]["frozen_bn_mean"], 0.0
    )
    np.testing.assert_allclose(
        new_params["backbone"]["body"]["stem"]["bn1"]["frozen_bn_var"], 1.0
    )
