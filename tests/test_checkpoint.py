import jax
import jax.numpy as jnp
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


def test_structure_mismatch_raises_concise_error(tmp_path):
    """Resuming an OUTPUT_DIR written by a different model/optimizer
    layout (config change or older code) must fail with an actionable
    one-liner, not orbax's full-pytree MaskedNode dump."""
    state = {
        "state": {"w": np.zeros((2, 3), np.float32)},
        "iteration": 2,
    }
    path = save_checkpoint(str(tmp_path), state, 2)
    target = {
        "state": {
            "w": np.zeros((2, 3), np.float32),
            # a param group the on-disk checkpoint predates
            "uncertain_bias": np.zeros((1,), np.float32),
        },
        "iteration": 0,
    }
    with pytest.raises(RuntimeError) as exc_info:
        load_checkpoint(path, target)
    msg = str(exc_info.value)
    assert "does not match" in msg and "OUTPUT_DIR" in msg
    assert len(msg) < 1000  # concise, not the pytree dump


def st_like_params():
    """Param tree shaped like STGeneralizedRCNN: shared backbone/rpn +
    teacher/student RoIHeadsBundle subtrees (student has an extra
    uncertainty head)."""

    def bundle(seed):
        rng = np.random.RandomState(seed)
        return {
            "roi_extractor": {
                "layer4": {
                    "block0": {
                        "conv1": {
                            "kernel": rng.randn(1, 1, 4, 4).astype(
                                np.float32
                            )
                        }
                    }
                }
            },
            "box_predictor": {
                "emb_pred": {
                    "kernel": rng.randn(8, 6).astype(np.float32),
                    "bias": rng.randn(6).astype(np.float32),
                },
                "bbox_pred": {
                    "kernel": rng.randn(8, 8).astype(np.float32),
                    "bias": rng.randn(8).astype(np.float32),
                },
            },
            "mask_predictor": {
                "mask_fcn_logits": {
                    "kernel": rng.randn(1, 1, 4, 2).astype(np.float32)
                }
            },
        }

    params = {
        "backbone": {
            "stem": {"conv1": {"kernel": np.zeros((7, 7, 3, 4), np.float32)}}
        },
        "teacher": bundle(1),
        "student": bundle(2),
    }
    params["student"]["mask_predictor"]["uncertain_pred"] = {
        "kernel": np.full((1, 1, 4, 1), 7.0, np.float32)
    }
    return params


def test_teacher_only_pth_routes_to_teacher_subtree():
    """A single-model (GeneralizedRCNN) .pth loaded into the ST tree must
    fill the TEACHER bundle deterministically — roi_heads.* maps onto
    teacher/* (the round-1 defect left it to dict-order ties)."""
    params = st_like_params()
    rng = np.random.RandomState(3)
    sd = {
        "roi_heads.box.predictor.emb_pred.weight": rng.randn(6, 8).astype(
            np.float32
        ),
        "roi_heads.box.predictor.emb_pred.bias": rng.randn(6).astype(
            np.float32
        ),
        "roi_heads.box.feature_extractor.head.layer4.0.conv1.weight": (
            rng.randn(4, 4, 1, 1).astype(np.float32)
        ),
        "roi_heads.mask.predictor.mask_fcn_logits.weight": rng.randn(
            2, 4, 1, 1
        ).astype(np.float32),
    }
    new_params, report = import_torch_state_dict(params, sd)
    assert report["matched"] == len(sd)
    np.testing.assert_allclose(
        new_params["teacher"]["box_predictor"]["emb_pred"]["kernel"],
        sd["roi_heads.box.predictor.emb_pred.weight"].T,
    )
    np.testing.assert_allclose(
        new_params["teacher"]["roi_extractor"]["layer4"]["block0"][
            "conv1"
        ]["kernel"],
        sd[
            "roi_heads.box.feature_extractor.head.layer4.0.conv1.weight"
        ].transpose(2, 3, 1, 0),
    )
    # student untouched by the import itself
    np.testing.assert_allclose(
        new_params["student"]["box_predictor"]["emb_pred"]["kernel"],
        params["student"]["box_predictor"]["emb_pred"]["kernel"],
    )


def test_full_st_checkpoint_routes_both_bundles():
    """roi_heads_student.* -> student/*, roi_heads.* -> teacher/*."""
    params = st_like_params()
    rng = np.random.RandomState(4)
    t = rng.randn(6, 8).astype(np.float32)
    s = rng.randn(6, 8).astype(np.float32)
    sd = {
        "roi_heads.box.predictor.emb_pred.weight": t,
        "roi_heads_student.box.predictor.emb_pred.weight": s,
    }
    new_params, report = import_torch_state_dict(params, sd)
    assert report["matched"] == 2
    np.testing.assert_allclose(
        new_params["teacher"]["box_predictor"]["emb_pred"]["kernel"], t.T
    )
    np.testing.assert_allclose(
        new_params["student"]["box_predictor"]["emb_pred"]["kernel"], s.T
    )


def test_populate_student_from_teacher():
    """prepare_model (st_generalized_rcnn.py:197-199): the student starts
    as a copy of the teacher; student-only leaves (uncertain_pred) keep
    their fresh init (strict=False)."""
    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.checkpoint import (
        populate_student_from_teacher,
    )

    params = st_like_params()
    new_params, copied = populate_student_from_teacher(params)
    teacher_leaves = 0

    def count(node):
        nonlocal teacher_leaves
        for v in node.values():
            if isinstance(v, dict):
                count(v)
            else:
                teacher_leaves += 1

    count(params["teacher"])
    assert copied == teacher_leaves
    np.testing.assert_allclose(
        new_params["student"]["box_predictor"]["emb_pred"]["kernel"],
        new_params["teacher"]["box_predictor"]["emb_pred"]["kernel"],
    )
    np.testing.assert_allclose(
        new_params["student"]["mask_predictor"]["uncertain_pred"]["kernel"],
        7.0,
    )
    # backbone untouched
    np.testing.assert_allclose(
        new_params["backbone"]["stem"]["conv1"]["kernel"], 0.0
    )


def test_conv_transpose_import():
    """torch ConvTranspose2d (in, out, kh, kw) kernels must be imported
    with a spatial flip: torch's deconv is the gradient of conv (taps
    reversed), flax's ConvTranspose reads the kernel unflipped.  Caught
    by the e2e reference parity suite (mask head conv5_mask maps were
    structurally wrong without the flip)."""
    import torch
    from flax import linen as nn

    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.checkpoint import (
        import_torch_state_dict,
    )

    t = torch.nn.ConvTranspose2d(4, 3, 2, stride=2)
    x = np.random.RandomState(0).randn(1, 4, 6, 6).astype(np.float32)
    with torch.no_grad():
        ref = t(torch.from_numpy(x)).numpy()

    m = nn.ConvTranspose(3, (2, 2), strides=(2, 2), name="conv5_mask")
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    params = m.init(jax.random.PRNGKey(0), xj)
    tree = {"mask_predictor": {"conv5_mask": params["params"]}}
    sd = {
        "roi_heads.mask.predictor.conv5_mask.weight": t.weight.detach().numpy(),
        "roi_heads.mask.predictor.conv5_mask.bias": t.bias.detach().numpy(),
    }
    new_tree, report = import_torch_state_dict(tree, sd)
    assert report["matched"] == 2, report
    out = np.asarray(
        m.apply({"params": new_tree["mask_predictor"]["conv5_mask"]}, xj)
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-5)


def test_async_checkpoint_pipelines_and_publishes(tmp_path):
    """block=False: the last_checkpoint tag appears only once the save
    is published (next save or flush), and always points at a
    restorable checkpoint."""
    import os

    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.checkpoint import (
        flush_pending_checkpoint,
        latest_checkpoint,
        load_checkpoint,
    )

    d = str(tmp_path / "ck")
    state1 = {"state": {"w": np.ones((4,), np.float32)}, "iteration": 1}
    save_checkpoint(d, state1, 1, block=False)
    state2 = {"state": {"w": np.full((4,), 2.0, np.float32)}, "iteration": 2}
    save_checkpoint(d, state2, 2, block=False)  # publishes save 1
    assert latest_checkpoint(d).endswith("model_0000001")
    flush_pending_checkpoint()  # publishes save 2
    assert latest_checkpoint(d).endswith("model_0000002")
    restored = load_checkpoint(latest_checkpoint(d))
    np.testing.assert_allclose(restored["state"]["w"], 2.0)
    assert int(restored["iteration"]) == 2


def test_model_zoo_cache_url(tmp_path, monkeypatch):
    """URL weight cache (reference utils/model_zoo.py cache_url +
    checkpoint.py:132-154 resolution): file:// download into the cache
    dir, Detectron model_final.pkl name flattening, cache hit without
    re-download, hash-prefix verification, and the full
    resolve_weight_path chain."""
    import os

    import pytest

    from cvpr22_cross_modal_pseudo_labeling_tpu.utils.model_zoo import (
        cache_url,
        resolve_weight_path,
    )

    src = tmp_path / "weights-abcdef12.pth"
    src.write_bytes(b"not-a-real-checkpoint")
    cache = tmp_path / "zoo"
    url = "file://" + str(src)

    # hash prefix in the name mismatches the content -> the mismatch
    # itself surfaces (a corrupt file must not read as a cache miss)
    with pytest.raises(ValueError, match="hash mismatch"):
        cache_url(url, model_dir=str(cache))

    import hashlib

    digest = hashlib.sha256(src.read_bytes()).hexdigest()
    good = tmp_path / f"weights-{digest[:8]}.pth"
    good.write_bytes(src.read_bytes())
    got = cache_url("file://" + str(good), model_dir=str(cache))
    assert os.path.exists(got) and got.startswith(str(cache))

    # cache hit: source removed, still resolves
    good.unlink()
    again = cache_url("file://" + str(good), model_dir=str(cache))
    assert again == got

    # Detectron flattening: every zoo model is model_final.pkl
    mf = tmp_path / "35858791" / "model_final.pkl"
    mf.parent.mkdir()
    mf.write_bytes(b"c2")
    got2 = cache_url("file://" + str(mf), model_dir=str(cache))
    assert "model_final.pkl" in os.path.basename(got2)
    assert os.path.basename(got2) != "model_final.pkl"  # flattened

    # resolve chain passthrough + env-dir default
    assert resolve_weight_path("") == ""
    assert resolve_weight_path("/abs/path.pth") == "/abs/path.pth"
    monkeypatch.setenv("CMPL_TPU_MODEL_ZOO", str(cache))
    assert resolve_weight_path("file_not_url.pth") == "file_not_url.pth"
