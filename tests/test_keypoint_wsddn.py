import jax
import jax.numpy as jnp
import numpy as np

from cvpr22_cross_modal_pseudo_labeling_tpu.models.roi_heads.keypoint_head import (
    KeypointPredictor,
    keypoint_inference,
    keypoint_loss,
    keypoints_to_heatmap_targets,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.models.roi_heads.wsddn_head import (
    WSDDNHead,
    wsddn_loss,
)


def test_keypoint_heatmap_targets():
    rois = jnp.array([[0.0, 0.0, 56.0, 56.0]])
    kps = jnp.array([[[28.0, 28.0, 2.0], [100.0, 100.0, 2.0],
                      [10.0, 10.0, 0.0]]])
    targets, valid = keypoints_to_heatmap_targets(kps, rois, 14)
    assert bool(valid[0, 0])
    assert not bool(valid[0, 1])  # out of roi
    assert not bool(valid[0, 2])  # invisible
    # (28/56)*14 = 7 -> index 7*14+7
    assert int(targets[0, 0]) == 7 * 14 + 7


def test_keypoint_predictor_and_loss():
    model = KeypointPredictor(num_keypoints=4, conv_layers=(32, 32))
    pooled = jnp.zeros((2, 14, 14, 8))
    params = model.init(jax.random.PRNGKey(0), pooled)
    logits = model.apply(params, pooled)
    assert logits.shape == (2, 56, 56, 4)
    rois = jnp.array([[0.0, 0.0, 56.0, 56.0], [0.0, 0.0, 28.0, 28.0]])
    kps = jnp.tile(jnp.array([[[10.0, 10.0, 2.0]] * 4]), (2, 1, 1))
    loss = keypoint_loss(logits, kps, rois, jnp.array([True, True]))
    assert np.isfinite(float(loss))
    xy, scores = keypoint_inference(logits, rois)
    assert xy.shape == (2, 4, 2)
    # coordinates inside the rois
    assert float(xy[0, :, 0].max()) <= 56.0


def test_wsddn_head():
    model = WSDDNHead(num_classes=5, hidden_dim=16)
    pooled = jnp.asarray(np.random.RandomState(0).randn(2, 8, 12),
                         jnp.float32)
    valid = jnp.ones((2, 8), bool)
    params = model.init(jax.random.PRNGKey(0), pooled, valid)
    prop_scores, img_scores = model.apply(params, pooled, valid)
    assert prop_scores.shape == (2, 8, 5)
    assert img_scores.shape == (2, 5)
    # detection softmax over proposals: column sums of det part <= 1,
    # image scores within (0, 8)
    assert float(img_scores.min()) >= 0.0
    labels = jnp.asarray(
        np.random.RandomState(1).randint(0, 2, (2, 5)), jnp.float32
    )
    loss = wsddn_loss(img_scores, labels)
    assert np.isfinite(float(loss))
