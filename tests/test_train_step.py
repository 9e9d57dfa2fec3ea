import jax
import jax.numpy as jnp
import numpy as np

from cvpr22_cross_modal_pseudo_labeling_tpu.config import get_default_cfg
from cvpr22_cross_modal_pseudo_labeling_tpu.engine.lr_schedule import (
    warmup_multistep_schedule,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.engine.optimizer import (
    frozen_prefixes_from_cfg,
    label_params,
    make_optimizer,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.engine.train_step import (
    TrainState,
    build_train_step,
    create_train_state,
    jit_train_step,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector import (
    GeneralizedRCNN,
    statics_from_cfg,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.parallel.mesh import make_mesh


def test_warmup_multistep_values():
    sched = warmup_multistep_schedule(
        0.01, steps=(100, 200), gamma=0.1, warmup_factor=1 / 3,
        warmup_iters=10, warmup_method="linear",
    )
    np.testing.assert_allclose(float(sched(0)), 0.01 / 3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(10)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(sched(150)), 0.001, rtol=1e-6)
    np.testing.assert_allclose(float(sched(250)), 0.0001, rtol=1e-6)


def tiny_cfg():
    cfg = get_default_cfg()
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.CLS_AGNOSTIC_BBOX_REG = True
    cfg.MODEL.CLS_AGNOSTIC_MASK = True
    cfg.MODEL.ROI_BOX_HEAD.EMBEDDING_BASED = True
    cfg.MODEL.ROI_BOX_HEAD.EMB_DIM = 16
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 8
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOP_N_TRAIN = 16
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = 16
    cfg.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 4
    cfg.TPU.MAX_GT = 2
    cfg.TPU.NMS_TILE = 64
    cfg.SOLVER.BASE_LR = 0.001
    cfg.SOLVER.CLIP_GRAD_NORM_AT = 5.0
    return cfg


def make_batch(b=8):
    rng = np.random.RandomState(0)
    return {
        "images": jnp.asarray(rng.rand(b, 64, 64, 3), jnp.float32),
        "image_sizes": jnp.tile(jnp.array([[64, 64]], jnp.int32), (b, 1)),
        "class_embeddings": jnp.asarray(rng.randn(8, 16), jnp.float32),
        "gt_boxes": jnp.tile(
            jnp.array([[[4.0, 4.0, 40.0, 40.0], [10.0, 10.0, 30.0, 50.0]]]),
            (b, 1, 1),
        ),
        "gt_labels": jnp.ones((b, 2), jnp.int32),
        "gt_valid": jnp.ones((b, 2), bool),
        "gt_masks": jnp.ones((b, 2, 28, 28)),
    }


def test_train_step_on_8_device_mesh():
    cfg = tiny_cfg()
    model = GeneralizedRCNN(statics_from_cfg(cfg))
    batch = make_batch()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        batch["images"][:1],
        batch["image_sizes"][:1],
        batch["class_embeddings"],
        {k: batch[k][:1] for k in ("gt_boxes", "gt_labels", "gt_valid", "gt_masks")},
        train=True,
    )
    tx, labels = make_optimizer(
        cfg, params["params"], frozen_prefixes_from_cfg(cfg)
    )
    state = create_train_state(params, tx, jax.random.PRNGKey(42))

    mesh = make_mesh(("data",), (-1,))
    assert mesh.devices.size == 8
    step = jit_train_step(
        build_train_step(model, tx, "GeneralizedRCNN"), mesh, batch
    )
    state, metrics = step(state, batch)
    m1 = {k: float(v) for k, v in metrics.items()}
    state, metrics = step(state, batch)
    m2 = {k: float(v) for k, v in metrics.items()}
    assert np.isfinite(m1["total_loss"]) and np.isfinite(m2["total_loss"])
    assert int(state.step) == 2
    assert m1["grad_norm"] > 0


def test_mmss_train_step():
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector.mmss_gcnn import (
        MMSSGridModel,
        mmss_statics_from_cfg,
    )

    cfg = get_default_cfg()
    cfg.MODEL.META_ARCHITECTURE = "MMSS-GCNN"
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-C5"
    cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT = 0
    cfg.MODEL.MMSS_HEAD.TYPES = ("GroundingHead",)
    cfg.MODEL.MMSS_HEAD.SPATIAL_DROPOUT = 6
    cfg.MODEL.MMSS_HEAD.GROUNDING.LOSS = "cross_entropy"
    cfg.MODEL.MMSS_HEAD.GROUNDING.ALIGNMENT = "softmax"
    cfg.MODEL.MMSS_HEAD.GROUNDING.ALIGNMENT_TEMPERATURE = 10.0
    cfg.SOLVER.CLIP_GRAD_NORM_AT = 5.0

    statics = mmss_statics_from_cfg(cfg)._replace(
        l_dim=16, vocab_size=64, lb_type="WordEmbedding"
    )
    model = MMSSGridModel(statics)
    b, w = 2, 6
    rng = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(rng.rand(b, 64, 64, 3), jnp.float32),
        "image_sizes": jnp.tile(jnp.array([[64, 64]], jnp.int32), (b, 1)),
        "input_ids": jnp.asarray(rng.randint(5, 64, (b, w)), jnp.int32),
        "attention_mask": jnp.ones((b, w), jnp.int32),
        "special_tokens_mask": jnp.zeros((b, w), jnp.int32),
    }
    captions = {
        k: batch[k]
        for k in ("input_ids", "attention_mask", "special_tokens_mask")
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "mlm": jax.random.PRNGKey(2)},
        batch["images"],
        batch["image_sizes"],
        captions,
        train=True,
    )
    tx, _ = make_optimizer(
        cfg, params["params"],
        frozen_prefixes_from_cfg(cfg, "MMSS-GCNN"),
    )
    state = create_train_state(params, tx, jax.random.PRNGKey(42))
    step = jax.jit(build_train_step(model, tx, "MMSS-GCNN"))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(state.step) == 1


def test_frozen_params_do_not_move():
    cfg = tiny_cfg()
    cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT = 2
    model = GeneralizedRCNN(statics_from_cfg(cfg))
    batch = make_batch(b=2)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        batch["images"][:1],
        batch["image_sizes"][:1],
        batch["class_embeddings"],
        {k: batch[k][:1] for k in ("gt_boxes", "gt_labels", "gt_valid", "gt_masks")},
        train=True,
    )
    prefixes = frozen_prefixes_from_cfg(cfg)
    assert "backbone/body/stem" in prefixes
    assert "backbone/body/layer1" in prefixes
    tx, labels = make_optimizer(cfg, params["params"], prefixes)
    state = create_train_state(params, tx, jax.random.PRNGKey(42))
    step = build_train_step(model, tx, "GeneralizedRCNN")
    new_state, _ = step(state, batch)

    old_stem = params["params"]["backbone"]["body"]["stem"]
    new_stem = new_state.params["params"]["backbone"]["body"]["stem"]
    for a, b in zip(
        jax.tree_util.tree_leaves(old_stem),
        jax.tree_util.tree_leaves(new_stem),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # trainable parts did move
    old_rpn = jax.tree_util.tree_leaves(params["params"]["rpn_head"])
    new_rpn = jax.tree_util.tree_leaves(
        new_state.params["params"]["rpn_head"]
    )
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(old_rpn, new_rpn)
    )
