"""End-to-end eval plumbing: tiny COCO fixture -> loader -> jitted eval
forward -> COCO-format results -> metrics.  Untrained model, so APs are
~0; the test validates shapes, scaling, RLE encoding and the metric
pipeline."""

import json

import numpy as np
import pytest
from PIL import Image

from cvpr22_cross_modal_pseudo_labeling_tpu.config import get_default_cfg
from cvpr22_cross_modal_pseudo_labeling_tpu.data.collate import BatchCollator
from cvpr22_cross_modal_pseudo_labeling_tpu.data.datasets.coco import (
    COCODataset,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.data.transforms import (
    build_transforms,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.engine.inference import inference
from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector import (
    GeneralizedRCNN,
    statics_from_cfg,
)


class ListLoader:
    def __init__(self, dataset, collator, batch_size=2):
        self.items = [
            ([dataset[i] for i in range(j, min(j + batch_size, len(dataset)))],
             list(range(j, min(j + batch_size, len(dataset)))))
            for j in range(0, len(dataset), batch_size)
        ]
        self.collator = collator

    def __iter__(self):
        for samples, idxs in self.items:
            yield self.collator(samples), idxs


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("cocoval")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(3):
        h, w = 60, 80
        Image.fromarray(
            (rng.rand(h, w, 3) * 255).astype(np.uint8)
        ).save(img_dir / f"img{i}.jpg")
        images.append(
            {"id": i + 1, "file_name": f"img{i}.jpg", "height": h, "width": w}
        )
        annotations.append(
            {
                "id": 100 + i,
                "image_id": i + 1,
                "category_id": 1,
                "bbox": [10, 10, 30, 25],
                "area": 750,
                "iscrowd": 0,
                "segmentation": [[10, 10, 39, 10, 39, 34, 10, 34]],
            }
        )
    ann = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {
                "id": 1,
                "name": "cat",
                "embedding": {"BertEmb": [0.1] * 16},
                "split": "seen",
            }
        ],
    }
    (root / "ann.json").write_text(json.dumps(ann))
    return str(root / "ann.json"), str(img_dir)


def test_inference_end_to_end(fixture):
    import jax

    ann_file, img_dir = fixture
    cfg = get_default_cfg()
    cfg.INPUT.MIN_SIZE_TEST = 48
    cfg.INPUT.MAX_SIZE_TEST = 64
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.CLS_AGNOSTIC_BBOX_REG = True
    cfg.MODEL.CLS_AGNOSTIC_MASK = True
    cfg.MODEL.ROI_BOX_HEAD.EMBEDDING_BASED = True
    cfg.MODEL.ROI_BOX_HEAD.EMB_DIM = 16
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = 16
    cfg.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 8
    cfg.MODEL.ROI_HEADS.SCORE_THRESH = 0.0
    cfg.TPU.NMS_TILE = 64

    tf = build_transforms(cfg, is_train=False)
    ds = COCODataset(
        ann_file, img_dir, False, transforms=tf,
        extra_args={"LOAD_EMBEDDINGS": True, "EMB_KEY": "BertEmb",
                    "EMB_DIM": 16},
    )
    collator = BatchCollator(
        buckets=((64, 64),), max_gt=4, max_cap_tokens=8, max_cap_nouns=2
    )
    loader = ListLoader(ds, collator)

    model = GeneralizedRCNN(statics_from_cfg(cfg))
    import jax.numpy as jnp

    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 64, 64, 3)),
        jnp.array([[48, 64]], jnp.int32),
        jnp.asarray(ds.class_emb_mtx),
        train=False,
    )
    metrics = inference(
        model, params, loader, ds, iou_types=("bbox", "segm")
    )
    assert "bbox/AP" in metrics and "segm/AP" in metrics
    assert "bbox/AP50_split_seen" in metrics
    assert np.isfinite(metrics["bbox/AP"]) or metrics["bbox/AP"] == -1.0
    assert metrics["expected_results_failures"] == 0


def test_inference_mesh_sharded_eval(fixture):
    """Single-process multi-chip eval: the eval batch shards over the
    'data' mesh axis; ragged final batches fall back to the unsharded
    program."""
    import jax
    import jax.numpy as jnp

    ann_file, img_dir = fixture
    cfg = get_default_cfg()
    cfg.INPUT.MIN_SIZE_TEST = 48
    cfg.INPUT.MAX_SIZE_TEST = 64
    cfg.MODEL.MASK_ON = False
    cfg.MODEL.CLS_AGNOSTIC_BBOX_REG = True
    cfg.MODEL.ROI_BOX_HEAD.EMBEDDING_BASED = True
    cfg.MODEL.ROI_BOX_HEAD.EMB_DIM = 16
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = 16
    cfg.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 8
    cfg.MODEL.ROI_HEADS.SCORE_THRESH = 0.0
    cfg.TPU.NMS_TILE = 64

    tf = build_transforms(cfg, is_train=False)
    ds = COCODataset(
        ann_file, img_dir, False, transforms=tf,
        extra_args={"LOAD_EMBEDDINGS": True, "EMB_KEY": "BertEmb",
                    "EMB_DIM": 16},
    )
    collator = BatchCollator(
        buckets=((64, 64),), max_gt=4, max_cap_tokens=8, max_cap_nouns=2
    )
    # batch of 2 over a 2-device mesh -> sharded program; final ragged
    # batch of 1 -> fallback
    loader = ListLoader(ds, collator, batch_size=2)

    model = GeneralizedRCNN(statics_from_cfg(cfg))
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 64, 64, 3)),
        jnp.array([[48, 64]], jnp.int32),
        jnp.asarray(ds.class_emb_mtx),
        train=False,
    )
    import numpy as _np

    from jax.sharding import Mesh

    mesh = Mesh(_np.array(jax.devices()[:2]), ("data",))
    metrics = inference(
        model, params, loader, ds, iou_types=("bbox",), mesh=mesh
    )
    assert "bbox/AP" in metrics

    # hybrid data x model mesh: the divisibility gate is the DATA axis
    # size (2), not the device count (4) — a batch of 2 must take the
    # sharded program (params replicated over 'model') and match
    hybrid = Mesh(
        _np.array(jax.devices()[:4]).reshape(2, 2), ("data", "model")
    )
    metrics_h = inference(
        model, params, loader, ds, iou_types=("bbox",), mesh=hybrid
    )
    assert metrics_h["bbox/AP"] == metrics["bbox/AP"]


def test_inference_bbox_aug_end_to_end(fixture):
    """TEST.BBOX_AUG path: multi-scale + flip TTA drives the same
    compiled model and produces bbox metrics (bbox-only, like the
    reference's engine/bbox_aug.py)."""
    import jax
    import jax.numpy as jnp

    ann_file, img_dir = fixture
    cfg = get_default_cfg()
    cfg.INPUT.MIN_SIZE_TEST = 48
    cfg.INPUT.MAX_SIZE_TEST = 64
    cfg.MODEL.MASK_ON = False
    cfg.MODEL.CLS_AGNOSTIC_BBOX_REG = True
    cfg.MODEL.ROI_BOX_HEAD.EMBEDDING_BASED = True
    cfg.MODEL.ROI_BOX_HEAD.EMB_DIM = 16
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = 16
    cfg.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 8
    cfg.MODEL.ROI_HEADS.SCORE_THRESH = 0.0
    cfg.TPU.NMS_TILE = 64

    ds = COCODataset(
        ann_file, img_dir, False, transforms=None,
        extra_args={"LOAD_EMBEDDINGS": True, "EMB_KEY": "BertEmb",
                    "EMB_DIM": 16},
    )

    model = GeneralizedRCNN(statics_from_cfg(cfg))
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 64, 64, 3)),
        jnp.array([[48, 64]], jnp.int32),
        jnp.asarray(ds.class_emb_mtx),
        train=False,
    )
    bbox_aug = {
        "scales": (40,),
        "max_size": 64,
        "h_flip": True,
        "scale_h_flip": True,
        "base_scale": 48,
        "pixel_mean": cfg.INPUT.PIXEL_MEAN,
        "pixel_std": cfg.INPUT.PIXEL_STD,
        "to_bgr255": cfg.INPUT.TO_BGR255,
        "buckets": ((64, 64),),
        "size_divisible": 8,
        "nms_thresh": 0.5,
        "detections_per_img": 8,
    }
    metrics = inference(
        model, params, None, ds, iou_types=("bbox",), bbox_aug=bbox_aug
    )
    assert "bbox/AP" in metrics
    assert np.isfinite(metrics["bbox/AP"]) or metrics["bbox/AP"] == -1.0


def test_local_eval_mesh_is_data_only_and_local():
    import jax

    from cvpr22_cross_modal_pseudo_labeling_tpu.parallel.mesh import (
        local_eval_mesh,
    )

    mesh = local_eval_mesh()
    assert mesh is not None  # 8 virtual devices in the test env
    assert tuple(mesh.axis_names) == ("data",)
    assert mesh.devices.size == len(jax.local_devices())
