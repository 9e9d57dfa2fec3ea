"""Multi-device == single-device equivalence (VERDICT r1 item 5).

(a) data-parallel training over an 8-device mesh produces the same
    loss/grad-norm trajectory as 1-device training on the same global
    batch;
(b) mesh-sharded eval returns identical detections to unsharded eval,
    including the ragged final batch fallback.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cvpr22_cross_modal_pseudo_labeling_tpu.config import get_default_cfg
from cvpr22_cross_modal_pseudo_labeling_tpu.engine.optimizer import (
    frozen_prefixes_from_cfg,
    make_optimizer,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.engine.train_step import (
    build_train_step,
    create_train_state,
    jit_train_step,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector import (
    GeneralizedRCNN,
    statics_from_cfg,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.parallel.mesh import make_mesh

from test_train_step import make_batch, tiny_cfg


def test_8dev_vs_1dev_training_trajectory():
    cfg = tiny_cfg()
    model = GeneralizedRCNN(statics_from_cfg(cfg))
    batch = make_batch(b=8)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        batch["images"][:1],
        batch["image_sizes"][:1],
        batch["class_embeddings"],
        {
            k: batch[k][:1]
            for k in ("gt_boxes", "gt_labels", "gt_valid", "gt_masks")
        },
        train=True,
    )
    tx, _ = make_optimizer(
        cfg, params["params"], frozen_prefixes_from_cfg(cfg)
    )

    def run(n_devices, steps=3):
        mesh = make_mesh(
            ("data",), (n_devices,), devices=jax.devices()[:n_devices]
        )
        state = create_train_state(
            jax.device_get(params), tx, jax.random.PRNGKey(42)
        )
        step = jit_train_step(
            build_train_step(model, tx, "GeneralizedRCNN"), mesh, batch
        )
        traj = []
        for _ in range(steps):
            state, metrics = step(state, batch)
            traj.append(
                (float(metrics["total_loss"]), float(metrics["grad_norm"]))
            )
        return traj

    t8 = run(8)
    t1 = run(1)
    for (l8, g8), (l1, g1) in zip(t8, t1):
        # identical math; only cross-device reduction order differs
        np.testing.assert_allclose(l8, l1, rtol=2e-5, err_msg=str((t8, t1)))
        np.testing.assert_allclose(g8, g1, rtol=2e-4)


def test_sharded_eval_identical_to_unsharded(tmp_path):
    """compute_on_dataset with a mesh must return the same COCO result
    dicts as without, including the ragged final batch (5 images in
    batches of 2 over a 2-device mesh -> last batch of 1 falls back)."""
    import json

    from PIL import Image

    from cvpr22_cross_modal_pseudo_labeling_tpu.data.collate import (
        BatchCollator,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.data.datasets.coco import (
        COCODataset,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.data.transforms import (
        build_transforms,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.inference import (
        compute_on_dataset,
    )

    rng = np.random.RandomState(0)
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    images, annotations = [], []
    for i in range(5):
        h, w = 60, 80
        Image.fromarray(
            (rng.rand(h, w, 3) * 255).astype(np.uint8)
        ).save(img_dir / f"img{i}.jpg")
        images.append(
            {"id": i + 1, "file_name": f"img{i}.jpg", "height": h,
             "width": w}
        )
        annotations.append(
            {"id": 100 + i, "image_id": i + 1, "category_id": 1,
             "bbox": [10, 10, 30, 25], "area": 750, "iscrowd": 0,
             "segmentation": [[10, 10, 39, 10, 39, 34, 10, 34]]}
        )
    ann = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"id": 1, "name": "cat",
             "embedding": {"BertEmb": [0.1] * 16}, "split": "seen"}
        ],
    }
    (tmp_path / "ann.json").write_text(json.dumps(ann))

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
        str(tmp_path / "ann.json"), str(img_dir), False, transforms=tf,
        extra_args={"LOAD_EMBEDDINGS": True, "EMB_KEY": "BertEmb",
                    "EMB_DIM": 16},
    )
    collator = BatchCollator(
        buckets=((64, 64),), max_gt=4, max_cap_tokens=8, max_cap_nouns=2
    )

    class ListLoader:
        def __init__(self, dataset, batch_size):
            self.items = [
                (
                    [dataset[i] for i in range(j, min(j + batch_size, len(dataset)))],
                    list(range(j, min(j + batch_size, len(dataset)))),
                )
                for j in range(0, len(dataset), batch_size)
            ]

        def __iter__(self):
            for samples, idxs in self.items:
                yield collator(samples), idxs

    model = GeneralizedRCNN(statics_from_cfg(cfg))
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 64, 64, 3)),
        jnp.array([[48, 64]], jnp.int32),
        jnp.asarray(ds.class_emb_mtx),
        train=False,
    )
    loader = ListLoader(ds, 2)
    mesh = make_mesh(("data",), (2,), devices=jax.devices()[:2])
    res_sharded = compute_on_dataset(
        model, params, loader, ds, ds.class_emb_mtx, mesh=mesh
    )
    res_plain = compute_on_dataset(
        model, params, ListLoader(ds, 2), ds, ds.class_emb_mtx, mesh=None
    )
    assert len(res_sharded) == len(res_plain) > 0
    from cvpr22_cross_modal_pseudo_labeling_tpu.utils.rle import decode_rle

    for a, b in zip(res_sharded, res_plain):
        assert a["image_id"] == b["image_id"]
        assert a["category_id"] == b["category_id"]
        # sharded and unsharded are different XLA programs; tolerate
        # reassociation-level float noise only
        np.testing.assert_allclose(a["score"], b["score"], rtol=1e-4)
        np.testing.assert_allclose(
            a["bbox"], b["bbox"], rtol=1e-3, atol=1e-2
        )
        if "segmentation" in a:
            ma = decode_rle(a["segmentation"]).astype(bool)
            mb = decode_rle(b["segmentation"]).astype(bool)
            union = (ma | mb).sum()
            if union:  # empty == empty is exact agreement
                assert (ma & mb).sum() / union > 0.99


def test_hybrid_data_model_mesh_matches_1dev():
    """(c) a 2-D data x model mesh — batch on 'data', class-embedding
    tables vocabulary-sharded on 'model' (train_step.batch_shardings) —
    gives the same loss as single-device on the same global batch."""
    cfg = tiny_cfg()
    model = GeneralizedRCNN(statics_from_cfg(cfg))
    batch = make_batch(b=4)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        batch["images"][:1],
        batch["image_sizes"][:1],
        batch["class_embeddings"],
        {
            k: batch[k][:1]
            for k in ("gt_boxes", "gt_labels", "gt_valid", "gt_masks")
        },
        train=True,
    )
    tx, _ = make_optimizer(
        cfg, params["params"], frozen_prefixes_from_cfg(cfg)
    )

    def run(axes, shape, n):
        mesh = make_mesh(axes, shape, devices=jax.devices()[:n])
        state = create_train_state(
            jax.device_get(params), tx, jax.random.PRNGKey(42)
        )
        step = jit_train_step(
            build_train_step(model, tx, "GeneralizedRCNN"), mesh, batch
        )
        traj = []
        for _ in range(2):
            state, metrics = step(state, batch)
            traj.append(
                (float(metrics["total_loss"]), float(metrics["grad_norm"]))
            )
        return traj

    t_hybrid = run(("data", "model"), (4, 2), 8)
    t_1 = run(("data",), (1,), 1)
    for (lh, gh), (l1, g1) in zip(t_hybrid, t_1):
        np.testing.assert_allclose(lh, l1, rtol=2e-5)
        np.testing.assert_allclose(gh, g1, rtol=2e-4)


def test_batch_shardings_ft_emb_keys_replicated():
    """The FT_EMB tokenized-class-name arrays ([C, T] ids/mask) must be
    replicated — NOT data-sharded (C is a vocabulary size, not a batch
    dim) and NOT vocab-sharded like the float tables (the in-step
    gather-by-id runs per shard)."""
    import jax.sharding as shd

    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.train_step import (
        batch_shardings,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.parallel.mesh import (
        make_mesh,
    )

    mesh = make_mesh(("data", "model"), (4, 2))
    ex = {
        "images": np.zeros((8, 32, 32, 3), np.float32),
        "lvis_name_ids": np.zeros((20, 4), np.int32),
        "lvis_name_mask": np.zeros((20, 4), np.int32),
        "lvis_class_embeddings": np.zeros((20, 16), np.float32),
    }
    sh = batch_shardings(ex, mesh)
    assert sh["lvis_name_ids"].spec == shd.PartitionSpec()
    assert sh["lvis_name_mask"].spec == shd.PartitionSpec()
    assert sh["lvis_class_embeddings"].spec == shd.PartitionSpec(
        "model", None
    )
    assert sh["images"].spec[0] is not None


def test_ft_emb_vocab_parallel_matches_unsharded():
    """FT_EMB on a data x model mesh: the train step rebuilds the LVIS
    table in loss_fn and constrains it PartitionSpec('model', None)
    (vocab-parallel, like batch_shardings gives the precomputed table);
    the result must equal the unsharded in-model rebuild."""
    import optax

    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.train_step import (
        build_train_step,
        create_train_state,
        jit_train_step,
        lvis_table_sharding,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector.st_generalized_rcnn import (
        STGeneralizedRCNN,
        st_statics_from_cfg,
    )
    from test_st_model import st_tiny_cfg

    cfg = st_tiny_cfg()
    statics = st_statics_from_cfg(cfg)._replace(vocab_size=64, lvis_vocab=20)
    model = STGeneralizedRCNN(statics)
    b, nw, t = 4, 3, 4
    rng = np.random.RandomState(3)
    images = jnp.asarray(rng.rand(b, 64, 64, 3), jnp.float32)
    image_sizes = jnp.tile(jnp.array([[64, 64]], jnp.int32), (b, 1))
    batch = {
        "images": images,
        "image_sizes": image_sizes,
        "cap_mask": jnp.array([True, False, True, False]),
        "det_mask": jnp.ones((b,), bool),
        "cap_tok_ids": jnp.asarray(rng.randint(5, 64, (b, nw, t)), jnp.int32),
        "cap_tok_mask": jnp.ones((b, nw, t), jnp.int32),
        "cap_word_valid": jnp.tile(jnp.array([[True, True, False]]), (b, 1)),
        "cap_labels": jnp.asarray(rng.randint(0, 20, (b, nw)), jnp.int32),
        "gt_boxes": jnp.tile(jnp.array([[4.0, 4.0, 30.0, 30.0]]), (b, 4, 1)),
        "gt_labels": jnp.ones((b, 4), jnp.int32),
        "gt_valid": jnp.tile(jnp.array([[True, True, False, False]]), (b, 1)),
        "gt_masks": jnp.ones((b, 4, 28, 28)),
        "class_embeddings": jnp.asarray(rng.randn(8, 16), jnp.float32),
        "lvis_name_ids": jnp.asarray(rng.randint(1, 64, (20, 4)), jnp.int32),
        "lvis_name_mask": jnp.ones((20, 4), jnp.int32),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        images,
        image_sizes,
        {k: v for k, v in batch.items() if k not in ("images", "image_sizes")},
        batch["class_embeddings"],
        jnp.zeros((20, 16)),
        train=True,
    )
    tx = optax.sgd(0.001)

    # unsharded baseline FIRST: jit_train_step donates its state, which
    # deletes the param buffers both TrainStates share
    step_plain = jax.jit(build_train_step(model, tx, "STGeneralizedRCNN"))
    state2 = create_train_state(params, tx, jax.random.PRNGKey(7))
    _, m_plain = step_plain(state2, batch)

    mesh = make_mesh(("data", "model"), (4, 2))
    assert lvis_table_sharding(mesh) is not None
    step_sharded = jit_train_step(
        build_train_step(
            model, tx, "STGeneralizedRCNN",
            lvis_table_sharding=lvis_table_sharding(mesh),
        ),
        mesh,
        batch,
    )
    state = create_train_state(params, tx, jax.random.PRNGKey(7))
    _, m_sharded = step_sharded(state, batch)

    assert np.isfinite(float(m_sharded["total_loss"]))
    np.testing.assert_allclose(
        float(m_sharded["total_loss"]),
        float(m_plain["total_loss"]),
        rtol=2e-5, atol=1e-5,
    )


def test_hybrid_mesh_odd_vocab_49_matches_1dev():
    """(d) VERDICT r4 #1: the hybrid data x model mesh must accept the
    production COCO 49-row class table.  pad_vocab_tables pads it to the
    'model'-axis multiple with a row mask; the padded, vocab-parallel
    run must give the SAME loss/grad trajectory as unpadded single-device
    (BoxPredictor masks the pad logits columns to an exact softmax
    no-op)."""
    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.train_step import (
        pad_vocab_tables,
    )

    cfg = tiny_cfg()
    model = GeneralizedRCNN(statics_from_cfg(cfg))
    batch = make_batch(b=4)
    rng = np.random.RandomState(11)
    batch["class_embeddings"] = jnp.asarray(
        rng.randn(49, 16), jnp.float32
    )
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        batch["images"][:1],
        batch["image_sizes"][:1],
        batch["class_embeddings"],
        {
            k: batch[k][:1]
            for k in ("gt_boxes", "gt_labels", "gt_valid", "gt_masks")
        },
        train=True,
    )
    tx, _ = make_optimizer(
        cfg, params["params"], frozen_prefixes_from_cfg(cfg)
    )

    def run(axes, shape, n, b):
        mesh = make_mesh(axes, shape, devices=jax.devices()[:n])
        padded = pad_vocab_tables(batch, mesh)
        if n > 1:
            # the fix under test: the padded table really is
            # vocab-parallel, not silently replicated
            import jax.sharding as shd

            from cvpr22_cross_modal_pseudo_labeling_tpu.engine.train_step import (
                batch_shardings,
            )

            assert padded["class_embeddings"].shape[0] == 50
            assert batch_shardings(padded, mesh)[
                "class_embeddings"
            ].spec == shd.PartitionSpec("model", None)
        state = create_train_state(
            jax.device_get(params), tx, jax.random.PRNGKey(42)
        )
        step = jit_train_step(
            build_train_step(model, tx, "GeneralizedRCNN"), mesh, padded
        )
        traj = []
        for _ in range(2):
            state, metrics = step(state, padded)
            traj.append(
                (float(metrics["total_loss"]), float(metrics["grad_norm"]))
            )
        return traj

    t_hybrid = run(("data", "model"), (4, 2), 8, 4)
    t_1 = run(("data",), (1,), 1, 4)
    for (lh, gh), (l1, g1) in zip(t_hybrid, t_1):
        np.testing.assert_allclose(lh, l1, rtol=2e-5)
        np.testing.assert_allclose(gh, g1, rtol=2e-4)


def test_ft_emb_vocab_parallel_odd_lvis_1203():
    """(e) FT_EMB at the REAL LVIS vocabulary (1203 rows, odd): the
    padded tokenized-name rows rebuild a 1204-row table in-step, the
    vocab-parallel constraint applies (1204 % 2 == 0), and the loss
    equals the unsharded, unpadded run."""
    import optax

    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.train_step import (
        build_train_step,
        create_train_state,
        jit_train_step,
        lvis_table_sharding,
        pad_vocab_tables,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector.st_generalized_rcnn import (
        STGeneralizedRCNN,
        st_statics_from_cfg,
    )
    from test_st_model import st_tiny_cfg

    lvis = 1203
    cfg = st_tiny_cfg()
    statics = st_statics_from_cfg(cfg)._replace(
        vocab_size=64, lvis_vocab=lvis
    )
    model = STGeneralizedRCNN(statics)
    b, nw, t = 4, 3, 4
    rng = np.random.RandomState(3)
    images = jnp.asarray(rng.rand(b, 64, 64, 3), jnp.float32)
    image_sizes = jnp.tile(jnp.array([[64, 64]], jnp.int32), (b, 1))
    batch = {
        "images": images,
        "image_sizes": image_sizes,
        "cap_mask": jnp.array([True, False, True, False]),
        "det_mask": jnp.ones((b,), bool),
        "cap_tok_ids": jnp.asarray(rng.randint(5, 64, (b, nw, t)), jnp.int32),
        "cap_tok_mask": jnp.ones((b, nw, t), jnp.int32),
        "cap_word_valid": jnp.tile(jnp.array([[True, True, False]]), (b, 1)),
        "cap_labels": jnp.asarray(rng.randint(0, lvis, (b, nw)), jnp.int32),
        "gt_boxes": jnp.tile(jnp.array([[4.0, 4.0, 30.0, 30.0]]), (b, 4, 1)),
        "gt_labels": jnp.ones((b, 4), jnp.int32),
        "gt_valid": jnp.tile(jnp.array([[True, True, False, False]]), (b, 1)),
        "gt_masks": jnp.ones((b, 4, 28, 28)),
        # odd dataset vocabulary too (the COCO open-vocab split is 49)
        "class_embeddings": jnp.asarray(rng.randn(49, 16), jnp.float32),
        "lvis_name_ids": jnp.asarray(
            rng.randint(1, 64, (lvis, t)), jnp.int32
        ),
        "lvis_name_mask": jnp.ones((lvis, t), jnp.int32),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        images,
        image_sizes,
        {k: v for k, v in batch.items() if k not in ("images", "image_sizes")},
        batch["class_embeddings"],
        jnp.zeros((lvis, 16)),
        train=True,
    )
    tx = optax.sgd(0.001)

    # unsharded, UNPADDED baseline first (jit_train_step donates state)
    step_plain = jax.jit(build_train_step(model, tx, "STGeneralizedRCNN"))
    state2 = create_train_state(params, tx, jax.random.PRNGKey(7))
    _, m_plain = step_plain(state2, batch)

    mesh = make_mesh(("data", "model"), (4, 2))
    padded = pad_vocab_tables(batch, mesh)
    assert padded["lvis_name_ids"].shape[0] == 1204
    assert padded["class_embeddings"].shape[0] == 50
    step_sharded = jit_train_step(
        build_train_step(
            model, tx, "STGeneralizedRCNN",
            lvis_table_sharding=lvis_table_sharding(mesh),
        ),
        mesh,
        padded,
    )
    state = create_train_state(params, tx, jax.random.PRNGKey(7))
    _, m_sharded = step_sharded(state, padded)

    assert np.isfinite(float(m_sharded["total_loss"]))
    np.testing.assert_allclose(
        float(m_sharded["total_loss"]),
        float(m_plain["total_loss"]),
        rtol=2e-5, atol=1e-5,
    )
