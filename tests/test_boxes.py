import jax.numpy as jnp
import numpy as np

from cvpr22_cross_modal_pseudo_labeling_tpu.core import (
    Boxes,
    box_area,
    box_iou,
    clip_to_image,
    compact_topk,
    decode_boxes,
    encode_boxes,
    flip_horizontal,
    nonempty_mask,
    pad_boxes,
    xywh_to_xyxy,
    xyxy_to_xywh,
)


def test_area_plus_one_convention():
    b = jnp.array([[0.0, 0.0, 9.0, 9.0]])
    # legacy convention: width = x2 - x1 + 1 = 10
    assert float(box_area(b)[0]) == 100.0


def test_iou_identity_and_disjoint():
    a = jnp.array([[0.0, 0.0, 9.0, 9.0], [100.0, 100.0, 109.0, 109.0]])
    iou = box_iou(a, a)
    np.testing.assert_allclose(np.diag(np.asarray(iou)), [1.0, 1.0], atol=1e-6)
    assert float(iou[0, 1]) == 0.0


def test_iou_half_overlap():
    a = jnp.array([[0.0, 0.0, 9.0, 9.0]])
    b = jnp.array([[0.0, 5.0, 9.0, 14.0]])
    # intersection h = min(9,14)-max(0,5)+1 = 5 -> 50; union = 100+100-50
    np.testing.assert_allclose(float(box_iou(a, b)[0, 0]), 50.0 / 150.0, atol=1e-6)


def test_encode_decode_roundtrip():
    rng = np.random.RandomState(0)
    proposals = rng.uniform(0, 100, (64, 2))
    proposals = np.concatenate(
        [proposals, proposals + rng.uniform(5, 80, (64, 2))], axis=1
    ).astype(np.float32)
    gt = rng.uniform(0, 100, (64, 2))
    gt = np.concatenate([gt, gt + rng.uniform(5, 80, (64, 2))], axis=1).astype(
        np.float32
    )
    weights = (10.0, 10.0, 5.0, 5.0)
    codes = encode_boxes(jnp.asarray(gt), jnp.asarray(proposals), weights)
    decoded = decode_boxes(codes, jnp.asarray(proposals), weights)
    # decode applies the legacy -1 on x2/y2 after the +1 width encode; the
    # roundtrip therefore reproduces gt exactly.
    np.testing.assert_allclose(np.asarray(decoded), gt, atol=1e-2)


def test_decode_multiclass_layout():
    proposals = jnp.array([[10.0, 10.0, 29.0, 29.0]])
    codes = jnp.zeros((1, 8))  # two classes of 4
    out = decode_boxes(codes, proposals, (10.0, 10.0, 5.0, 5.0))
    assert out.shape == (1, 8)
    np.testing.assert_allclose(np.asarray(out[0, :4]), np.asarray(out[0, 4:]))
    np.testing.assert_allclose(np.asarray(out[0, :4]), [10, 10, 29, 29], atol=1e-4)


def test_clip_and_nonempty():
    boxes = jnp.array([[-5.0, -5.0, 120.0, 50.0], [3.0, 3.0, 3.0, 3.0]])
    clipped = clip_to_image(boxes, jnp.array([100, 100]))
    np.testing.assert_allclose(np.asarray(clipped[0]), [0, 0, 99, 50])
    mask = nonempty_mask(clipped, min_size=2.0)
    assert bool(mask[0]) and not bool(mask[1])


def test_flip_horizontal_involution():
    boxes = jnp.array([[10.0, 5.0, 30.0, 25.0]])
    once = flip_horizontal(boxes, 100.0)
    twice = flip_horizontal(once, 100.0)
    np.testing.assert_allclose(np.asarray(twice), np.asarray(boxes))


def test_xywh_roundtrip():
    b = jnp.array([[4.0, 5.0, 19.0, 25.0]])
    np.testing.assert_allclose(
        np.asarray(xywh_to_xyxy(xyxy_to_xywh(b))), np.asarray(b)
    )


def test_pad_and_compact_topk():
    xyxy = jnp.array([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 20.0, 20.0]])
    scores = jnp.array([0.3, 0.9])
    boxes = pad_boxes(xyxy, 8, {"scores": scores})
    assert boxes.capacity == 8
    assert int(boxes.num_valid()) == 2
    top = compact_topk(boxes, 4)
    assert top.capacity == 4
    # highest score first
    np.testing.assert_allclose(np.asarray(top.xyxy[0]), [5, 5, 20, 20])
    assert bool(top.valid[0]) and bool(top.valid[1])
    assert not bool(top.valid[2])


def test_concat_boxes():
    from cvpr22_cross_modal_pseudo_labeling_tpu.core import concat_boxes

    a = pad_boxes(jnp.ones((2, 4)), 4, {"scores": jnp.ones(2)})
    b = pad_boxes(jnp.zeros((1, 4)), 2, {"scores": jnp.zeros(1),
                                         "extra": jnp.zeros(1)})
    c = concat_boxes(a, b)
    assert c.capacity == 6
    assert int(c.num_valid()) == 3
    # only shared fields survive (cat_boxlist semantics)
    assert set(c.fields) == {"scores"}
    assert c.fields["scores"].shape == (6,)


def test_boxes_is_pytree():
    import jax

    boxes = pad_boxes(jnp.zeros((3, 4)), 8, {"scores": jnp.zeros(3)})
    leaves = jax.tree_util.tree_leaves(boxes)
    assert len(leaves) == 3
    mapped = jax.tree_util.tree_map(lambda x: x, boxes)
    assert isinstance(mapped, Boxes)
