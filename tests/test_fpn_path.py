import jax
import jax.numpy as jnp
import numpy as np

from cvpr22_cross_modal_pseudo_labeling_tpu.config import get_default_cfg
from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector import (
    GeneralizedRCNN,
    statics_from_cfg,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.models.roi_heads.extractors import (
    FPN2MLPFeatureExtractor,
    FPNPredictor,
    FPNXconv1fcFeatureExtractor,
    MaskRCNNConv1x1Predictor,
    pixel_score_uncertainty,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.models.roi_heads.pooler import (
    assign_fpn_levels,
    pool_rois,
)


def test_fpn_level_assignment():
    boxes = jnp.array(
        [
            [0, 0, 31, 31],       # ~32px -> low level
            [0, 0, 223, 223],     # canonical 224 -> level 4
            [0, 0, 899, 899],     # large -> high level
        ],
        jnp.float32,
    )
    lvls = assign_fpn_levels(boxes, k_min=2, k_max=5)
    assert int(lvls[0]) == 0  # clamped to k_min
    assert int(lvls[1]) == 2  # 224 -> k=4 -> index 2
    assert int(lvls[2]) == 3  # clamped to k_max


def test_multilevel_pool_matches_single_when_one_level_selected():
    rng = np.random.RandomState(0)
    feats = [
        jnp.asarray(rng.randn(1, 32, 32, 4), jnp.float32),  # stride 4
        jnp.asarray(rng.randn(1, 16, 16, 4), jnp.float32),  # stride 8
    ]
    # small box -> always level 0
    boxes = jnp.array([[[4.0, 4.0, 20.0, 20.0]]])
    out_multi = pool_rois(
        feats, boxes, (7, 7), (1.0 / 4, 1.0 / 8), 2, use_mxu=False
    )
    out_single = pool_rois(
        [feats[0]], boxes, (7, 7), (1.0 / 4,), 2, use_mxu=False
    )
    np.testing.assert_allclose(
        np.asarray(out_multi), np.asarray(out_single), atol=1e-5
    )


def test_fpn_generalized_rcnn_eval():
    """R-50-FPN config end-to-end eval (per-level RPN selection +
    FPN top-N + multi-level pooling)."""
    cfg = get_default_cfg()
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN"
    cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256
    cfg.MODEL.RPN.USE_FPN = True
    cfg.MODEL.RPN.ANCHOR_STRIDE = (4, 8, 16, 32, 64)
    cfg.MODEL.RPN.ANCHOR_SIZES = (32, 64, 128, 256, 512)
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 32
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = 8
    cfg.MODEL.ROI_HEADS.USE_FPN = True
    cfg.MODEL.ROI_BOX_HEAD.POOLER_SCALES = (0.25, 0.125, 0.0625, 0.03125)
    cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO = 2
    cfg.MODEL.ROI_BOX_HEAD.EMB_DIM = 8
    cfg.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 4
    cfg.MODEL.MASK_ON = False
    cfg.TPU.NMS_TILE = 64
    model = GeneralizedRCNN(statics_from_cfg(cfg))
    images = jnp.zeros((1, 64, 64, 3))
    sizes = jnp.array([[64, 64]], jnp.int32)
    emb = jnp.asarray(np.random.RandomState(0).randn(5, 8), jnp.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, images, sizes, emb, train=False
    )
    out = model.apply(params, images, sizes, emb, train=False)
    assert out.detections.boxes.shape == (1, 4, 4)


def test_alternative_extractors_and_predictors():
    pooled = jnp.asarray(
        np.random.RandomState(0).randn(3, 7, 7, 16), jnp.float32
    )
    m = FPN2MLPFeatureExtractor(mlp_head_dim=32)
    p = m.init(jax.random.PRNGKey(0), pooled)
    x = m.apply(p, pooled)
    assert x.shape == (3, 32)

    m2 = FPNXconv1fcFeatureExtractor(
        conv_head_dim=8, num_stacked_convs=2, mlp_head_dim=16
    )
    p2 = m2.init(jax.random.PRNGKey(0), pooled)
    assert m2.apply(p2, pooled).shape == (3, 16)

    pred = FPNPredictor(num_classes=5)
    pp = pred.init(jax.random.PRNGKey(0), x)
    logits, deltas = pred.apply(pp, x)
    assert logits.shape == (3, 5) and deltas.shape == (3, 20)

    mp = MaskRCNNConv1x1Predictor(num_classes=2)
    mpp = mp.init(jax.random.PRNGKey(0), pooled)
    assert mp.apply(mpp, pooled).shape == (3, 7, 7, 2)

    unc = pixel_score_uncertainty(jnp.zeros((2, 4, 4, 1)))
    np.testing.assert_allclose(np.asarray(unc), 1.0)  # p=0.5 -> max unc


def test_fbnet_backbone_archs():
    """FBNet trunk (models/fbnet.py): every shipped arch builds and
    emits a stride-16 single-level feature map with the expected
    channel count; scale factor rounds via the width divisor."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cvpr22_cross_modal_pseudo_labeling_tpu.models.fbnet import (
        MODEL_ARCH,
        FBNetTrunk,
    )

    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    expect = {
        "default": 96, "xirb16d_dsmask": 128, "mobilenet_v2": 96,
        "cham_v1a": 88, "cham_v2": 56,
    }
    for arch in MODEL_ARCH:
        m = FBNetTrunk(arch=arch)
        params = m.init({"params": jax.random.PRNGKey(0)}, x)
        (y,) = m.apply(params, x)
        assert y.shape == (1, 4, 4, expect[arch]), (arch, y.shape)
        assert m.out_channels == expect[arch]

    m = FBNetTrunk(arch="default", scale_factor=0.5, width_divisor=8)
    params = m.init({"params": jax.random.PRNGKey(0)}, x)
    (y,) = m.apply(params, x)
    assert y.shape[-1] == m.out_channels == 48


def test_fbnet_via_build_backbone():
    import jax
    import jax.numpy as jnp

    from cvpr22_cross_modal_pseudo_labeling_tpu.config import get_default_cfg
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.backbone import (
        build_backbone,
    )

    cfg = get_default_cfg()
    cfg.MODEL.BACKBONE.CONV_BODY = "FBNet"
    mod, meta = build_backbone(cfg)
    assert meta["out_channels"] == 96
    assert meta["strides"] == (16,)
    params = mod.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 32, 32, 3))
    )
    (y,) = mod.apply(params, jnp.zeros((1, 32, 32, 3)))
    assert y.shape == (1, 2, 2, 96)


def test_fpn_post_nms_top_n_per_image_and_per_batch():
    """Reference rpn/inference.py:154-181: after per-level NMS the FPN
    stage keeps fpn_post_nms_top_n proposals — per image at test time,
    over the whole batch's concatenated objectness in training
    (Detectron Issue #672 quirk)."""
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.rpn.rpn import (
        select_proposals_multi_level,
    )

    rng = np.random.RandomState(3)
    # two levels of well-separated anchors so NMS keeps everything
    def grid(n, step, size):
        xs = (np.arange(n) * step).astype(np.float32)
        return np.stack(
            [xs, np.zeros(n, np.float32), xs + size, np.full(n, size, np.float32)],
            axis=1,
        )

    anchor_list = [jnp.asarray(grid(8, 40.0, 16.0)), jnp.asarray(grid(6, 50.0, 20.0))]
    n_tot = 14
    b = 2
    obj = jnp.asarray(rng.randn(b, n_tot).astype(np.float32)) * 4.0
    reg = jnp.zeros((b, n_tot, 4), jnp.float32)
    sizes = jnp.full((b, 2), 512.0, jnp.float32)

    common = dict(
        image_sizes=sizes, pre_nms_top_n=16, post_nms_top_n=16,
        nms_thresh=0.7, min_size=0.0, nms_tile=32,
    )
    # per-image: each image independently keeps its top-5
    out = select_proposals_multi_level(
        anchor_list, obj, reg, fpn_post_nms_top_n=5,
        fpn_post_nms_per_batch=False, **common,
    )
    assert out.boxes.shape[1] == 5
    assert np.asarray(out.valid).sum(axis=1).tolist() == [5, 5]
    scores = jax.nn.sigmoid(np.sort(np.asarray(obj), axis=1)[:, ::-1][:, :5])
    np.testing.assert_allclose(
        np.sort(np.asarray(out.scores), axis=1)[:, ::-1], scores, rtol=1e-6
    )

    # per-batch: top-5 over both images' concatenated objectness —
    # images get unequal shares
    out_b = select_proposals_multi_level(
        anchor_list, obj, reg, fpn_post_nms_top_n=5,
        fpn_post_nms_per_batch=True, **common,
    )
    valid = np.asarray(out_b.valid)
    assert valid.sum() == 5
    flat_scores = jax.nn.sigmoid(np.asarray(obj).reshape(-1))
    expect = set(np.round(np.sort(flat_scores)[::-1][:5], 6).tolist())
    got = set(
        np.round(np.asarray(out_b.scores)[valid], 6).tolist()
    )
    assert got == expect


def test_fpn_post_nms_per_batch_group_granularity():
    """per_batch_groups=G splits the global batch into G contiguous
    groups and applies the train-time top-N per group — the reference's
    per-GPU minibatch granularity (rpn/inference.py:154-171 runs per
    process).  G groups must equal G independent per-group selections."""
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.rpn.rpn import (
        select_proposals_multi_level,
    )

    rng = np.random.RandomState(7)

    def grid(n, step, size):
        xs = (np.arange(n) * step).astype(np.float32)
        return np.stack(
            [xs, np.zeros(n, np.float32), xs + size, np.full(n, size, np.float32)],
            axis=1,
        )

    anchor_list = [jnp.asarray(grid(8, 40.0, 16.0)), jnp.asarray(grid(6, 50.0, 20.0))]
    n_tot, b = 14, 4
    obj = jnp.asarray(rng.randn(b, n_tot).astype(np.float32)) * 4.0
    reg = jnp.zeros((b, n_tot, 4), jnp.float32)
    sizes = jnp.full((b, 2), 512.0, jnp.float32)
    common = dict(
        pre_nms_top_n=16, post_nms_top_n=16,
        nms_thresh=0.7, min_size=0.0, nms_tile=32,
        fpn_post_nms_top_n=5, fpn_post_nms_per_batch=True,
    )

    grouped = select_proposals_multi_level(
        anchor_list, obj, reg, image_sizes=sizes,
        per_batch_groups=2, **common,
    )
    # each 2-image group independently keeps 5
    valid = np.asarray(grouped.valid)
    assert valid[:2].sum() == 5 and valid[2:].sum() == 5

    for lo, hi in ((0, 2), (2, 4)):
        solo = select_proposals_multi_level(
            anchor_list, obj[lo:hi], reg[lo:hi],
            image_sizes=sizes[lo:hi], per_batch_groups=1, **common,
        )
        sv = np.asarray(solo.valid)
        np.testing.assert_allclose(
            np.sort(np.asarray(grouped.scores)[lo:hi][valid[lo:hi]]),
            np.sort(np.asarray(solo.scores)[sv]),
            rtol=1e-6,
        )

    # a partial trailing batch (DROP_LAST False flushes leftovers every
    # epoch) must not fail: indivisible batch falls back to the
    # coarsest compatible grouping (gcd(3, 2) = 1 -> one global group)
    out_partial = select_proposals_multi_level(
        anchor_list, obj[:3], reg[:3], image_sizes=sizes[:3],
        per_batch_groups=2, **common,
    )
    assert np.asarray(out_partial.valid).sum() == 5


def test_grouped_fpn_selection_under_8dev_mesh():
    """per_batch_groups=8 over an 8-device data mesh (one image per
    shard): the grouped train-time top-N compiles under GSPMD with the
    batch actually sharded and matches the unsharded computation —
    production wiring (train_net passes the mesh's data-axis size as
    the group count)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cvpr22_cross_modal_pseudo_labeling_tpu.models.rpn.rpn import (
        select_proposals_multi_level,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.parallel.mesh import (
        make_mesh,
    )

    rng = np.random.RandomState(11)

    def grid(n, step, size):
        xs = (np.arange(n) * step).astype(np.float32)
        return np.stack(
            [xs, np.zeros(n, np.float32), xs + size, np.full(n, size, np.float32)],
            axis=1,
        )

    anchor_list = [jnp.asarray(grid(8, 40.0, 16.0)), jnp.asarray(grid(6, 50.0, 20.0))]
    b, n_tot = 8, 14
    obj = np.asarray(rng.randn(b, n_tot), np.float32) * 4.0
    reg = np.zeros((b, n_tot, 4), np.float32)
    sizes = np.full((b, 2), 512.0, np.float32)

    def select(o, r, s):
        return select_proposals_multi_level(
            anchor_list, o, r, s,
            pre_nms_top_n=16, post_nms_top_n=16, nms_thresh=0.7,
            min_size=0.0, nms_tile=32, fpn_post_nms_top_n=5,
            fpn_post_nms_per_batch=True, per_batch_groups=8,
        )

    mesh = make_mesh(("data",), (8,))
    sh = NamedSharding(mesh, P("data"))
    out_sharded = jax.jit(select)(
        jax.device_put(obj, sh),
        jax.device_put(reg, sh),
        jax.device_put(sizes, sh),
    )
    out_host = select(jnp.asarray(obj), jnp.asarray(reg), jnp.asarray(sizes))

    np.testing.assert_array_equal(
        np.asarray(out_sharded.valid), np.asarray(out_host.valid)
    )
    np.testing.assert_allclose(
        np.asarray(out_sharded.scores), np.asarray(out_host.scores), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_sharded.boxes), np.asarray(out_host.boxes), rtol=1e-6
    )
    # each image (its own group) keeps its own top-5
    assert np.asarray(out_sharded.valid).sum(axis=1).tolist() == [5] * 8
