import jax
import jax.numpy as jnp
import numpy as np

from cvpr22_cross_modal_pseudo_labeling_tpu.config import get_default_cfg
from cvpr22_cross_modal_pseudo_labeling_tpu.models.rpn.retinanet import (
    RetinaNet,
    RetinaNetStatics,
    retinanet_statics_from_cfg,
)


def test_retinanet_train_and_eval():
    cfg = get_default_cfg()
    s = retinanet_statics_from_cfg(cfg)._replace(
        num_classes=5,
        pre_nms_top_n=50,
        detections_per_img=10,
        num_convs=1,
    )
    model = RetinaNet(s, dtype=jnp.float32)
    images = jnp.zeros((1, 64, 64, 3))
    sizes = jnp.array([[64, 64]], jnp.int32)
    targets = {
        "gt_boxes": jnp.array([[[5.0, 5.0, 40.0, 40.0]]]),
        "gt_labels": jnp.array([[2]], jnp.int32),
        "gt_valid": jnp.array([[True]]),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, images, sizes, targets, True
    )
    losses = model.apply(params, images, sizes, targets, True)
    assert set(losses) == {"loss_retina_cls", "loss_retina_reg"}
    for v in losses.values():
        assert np.isfinite(float(v))

    dets = model.apply(params, images, sizes, train=False)
    assert dets.boxes.shape == (1, 10, 4)
    assert dets.labels.shape == (1, 10)

    # differentiable
    g = jax.grad(
        lambda p: sum(
            model.apply(p, images, sizes, targets, True).values()
        )
    )(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)


def test_retinanet_via_config_and_engine():
    """MODEL.RETINANET_ON builds the engine-facing detector from
    build_detection_model and it trains/evals with the GeneralizedRCNN
    call surface (reference rpn.py:204-205 dispatch)."""
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector import (
        build_detection_model,
    )

    cfg = get_default_cfg()
    cfg.MODEL.RETINANET_ON = True
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN-RETINANET"
    cfg.MODEL.RETINANET.NUM_CLASSES = 4
    cfg.MODEL.RETINANET.ANCHOR_SIZES = (16, 32, 64, 128, 256)
    cfg.TPU.NMS_TILE = 64
    model = build_detection_model(cfg)
    images = jnp.zeros((1, 64, 64, 3))
    sizes = jnp.array([[64, 64]], jnp.int32)
    targets = {
        "gt_boxes": jnp.array([[[4.0, 4.0, 40.0, 40.0]]]),
        "gt_labels": jnp.ones((1, 1), jnp.int32),
        "gt_valid": jnp.ones((1, 1), bool),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, images, sizes, None, targets,
        train=True,
    )
    out = model.apply(params, images, sizes, None, targets, train=True)
    assert set(out.losses) == {"loss_retina_cls", "loss_retina_reg"}
    assert all(np.isfinite(float(v)) for v in out.losses.values())
    ev = model.apply(params, images, sizes, train=False)
    assert ev.detections.boxes.ndim == 3
    assert ev.mask_probs is None
