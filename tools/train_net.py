#!/usr/bin/env python
"""Training CLI.

Mirrors the argparse surface of the reference tools/train_net.py:162-237
(``--config-file X.yaml [--skip-test] KEY VALUE ...``).  One process per
host; devices on a host form (part of) the data mesh — there is no
torch.distributed.launch equivalent because SPMD replaces
one-process-per-accelerator (jax.distributed.initialize is called
automatically under multi-host env vars).
"""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="TPU open-vocab detection training")
    p.add_argument("--config-file", default="", metavar="FILE")
    p.add_argument("--skip-test", action="store_true")
    p.add_argument(
        "opts", nargs=argparse.REMAINDER, default=None,
        help="config overrides: KEY VALUE pairs",
    )
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    if "JAX_COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()

    from cvpr22_cross_modal_pseudo_labeling_tpu.config import get_default_cfg
    from cvpr22_cross_modal_pseudo_labeling_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    from cvpr22_cross_modal_pseudo_labeling_tpu.utils.logger import setup_logger

    cfg = get_default_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    output_dir = cfg.OUTPUT_DIR
    os.makedirs(output_dir, exist_ok=True)
    logger = setup_logger(
        "cmpl_tpu", output_dir, jax.process_index()
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.utils.env_info import (
        collect_env_info,
    )

    logger.info("environment:\n%s", collect_env_info())
    logger.info("config:\n%s", cfg)

    state, model = train(cfg, logger)
    if not args.skip_test and cfg.TEST.DO_EVAL:
        run_test(cfg, model, state, logger)


def train(cfg, logger):
    import jax
    import jax.numpy as jnp

    from cvpr22_cross_modal_pseudo_labeling_tpu.data import make_data_loader
    from cvpr22_cross_modal_pseudo_labeling_tpu.data.collate import (
        build_tokenizer,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.data.parser import (
        load_lvis_categories,
        normalize_class_names,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.checkpoint import (
        latest_checkpoint,
        load_checkpoint,
        populate_student_from_teacher,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.optimizer import (
        frozen_prefixes_from_cfg,
        make_optimizer,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.train_step import (
        build_train_step,
        create_train_state,
        jit_train_step,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.trainer import (
        compute_class_name_embeddings,
        do_train,
        tokenize_class_names,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector import (
        RCNN_FAMILY,
        ST_FAMILY,
        build_detection_model,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.parallel.mesh import make_mesh

    meta_arch = cfg.MODEL.META_ARCHITECTURE

    # Resume discovery BEFORE the loader is built: the checkpoint dir
    # name encodes the step (model_%07d), so start_iter reaches the
    # sampler (reference threads start_iter into make_data_loader,
    # data/build.py:115 + trainer.py:94).  A resumed grain stream is
    # positioned by its own saved iterator state instead, so the grain
    # loader must NOT also be sliced (that would double-skip).
    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.trainer import (
        loader_state_path,
    )

    start_iter = 0
    last = latest_checkpoint(cfg.OUTPUT_DIR)
    if last and cfg.MODEL.LOAD_TRAINER_STATE:
        start_iter = int(os.path.basename(last).rsplit("_", 1)[-1])
    has_loader_state = os.path.exists(loader_state_path(cfg.OUTPUT_DIR))
    use_stream_state = (
        cfg.DATALOADER.USE_GRAIN and has_loader_state and start_iter > 0
    )

    from cvpr22_cross_modal_pseudo_labeling_tpu.parallel.mesh import (
        data_axis_size,
    )

    model = build_detection_model(
        cfg,
        data_shards=data_axis_size(cfg.TPU.MESH_AXES, cfg.TPU.MESH_SHAPE),
    )
    loader, dataset = make_data_loader(
        cfg,
        is_train=True,
        is_distributed=jax.process_count() > 1,
        start_iter=0 if use_stream_state else start_iter,
        rank=jax.process_index(),
        num_replicas=jax.process_count(),
    )

    # one example batch to initialize parameters, built directly from
    # the dataset so the training stream itself is not consumed and no
    # prefetch thread is left running (reference builds the loader with
    # the model already constructed and never needs this)
    example_batch, _ = loader.example_batch()
    extra_batch = {}
    class_emb = getattr(dataset, "class_emb_mtx", None)
    if class_emb is not None:
        extra_batch["class_embeddings"] = np.asarray(class_emb, np.float32)

    rngs = {
        "params": jax.random.PRNGKey(0),
        "sampler": jax.random.PRNGKey(1),
        "uncertainty": jax.random.PRNGKey(2),
        "dropout": jax.random.PRNGKey(3),
        "mlm": jax.random.PRNGKey(4),
        "alignment": jax.random.PRNGKey(5),
    }
    images = jnp.asarray(example_batch["images"][:1])
    sizes = jnp.asarray(example_batch["image_sizes"][:1])
    if meta_arch in RCNN_FAMILY:
        target_keys = ["gt_boxes", "gt_labels", "gt_valid", "gt_masks"]
        if "gt_keypoints" in example_batch:
            target_keys.append("gt_keypoints")
        targets = {
            k: jnp.asarray(example_batch[k][:1]) for k in target_keys
        }
        # jit the init: eager init dispatches thousands of ops through
        # the device tunnel (minutes); jitted it is one program
        params = jax.jit(
            lambda r, im, sz, ce, tg: model.init(
                r, im, sz, ce, tg, train=True
            )
        )(
            rngs, images, sizes,
            (
                jnp.asarray(extra_batch["class_embeddings"])
                if extra_batch.get("class_embeddings") is not None
                else None
            ),
            targets,
        )
    elif meta_arch in ST_FAMILY:
        small = {
            k: jnp.asarray(v[:1])
            for k, v in example_batch.items()
            if isinstance(v, np.ndarray) and v.ndim >= 1
            and v.shape[0] == example_batch["images"].shape[0]
        }
        lvis_names = normalize_class_names(
            [c["name"] for c in load_lvis_categories()]
        )
        # placeholder until BERT params exist; recomputed below
        extra_batch["lvis_class_embeddings"] = np.zeros(
            (len(lvis_names), cfg.MODEL.ROI_BOX_HEAD.EMB_DIM), np.float32
        )
        # dataset-class -> LVIS-slot map for det-branch exemplar mixing
        # (reference combine_embs matches by name, :372-376)
        if getattr(dataset, "class_names", None):
            from cvpr22_cross_modal_pseudo_labeling_tpu.data.parser import (
                lvis_ids_for_class_names,
            )

            extra_batch["class_lvis_ids"] = np.asarray(
                lvis_ids_for_class_names(dataset.class_names), np.int32
            )
        params = jax.jit(
            lambda r, im, sz, b, ce, le: model.init(
                r, im, sz, b, ce, le, train=True
            )
        )(
            rngs, images, sizes, small,
            jnp.asarray(extra_batch["class_embeddings"]),
            jnp.asarray(extra_batch["lvis_class_embeddings"]),
        )
    else:  # MMSS-GCNN
        captions = {
            k: jnp.asarray(example_batch[k][:1])
            for k in ("input_ids", "attention_mask", "special_tokens_mask")
        }
        params = jax.jit(
            lambda r, im, sz, c: model.init(r, im, sz, c, train=True)
        )(rngs, images, sizes, captions)

    # weight loading: catalog:// / URL-cache resolution, Caffe2 .pkl,
    # or torch .pth (reference checkpoint.py:132-154 chain)
    from cvpr22_cross_modal_pseudo_labeling_tpu.utils.model_zoo import (
        resolve_weight_path,
    )

    # On a resume the checkpoint restore below overwrites params
    # wholesale, so skip the init-weight resolution + import entirely
    # (the reference checkpointer likewise ignores MODEL.WEIGHT once a
    # checkpoint exists, utils/checkpoint.py:55-63).  The ST family's
    # LVIS class-name embeddings are then computed AFTER the restore
    # from the restored (frozen) BERT — identical to the fresh-run
    # values without reloading the multi-GB init bundle on every
    # relaunch.
    resuming = bool(last and cfg.MODEL.LOAD_TRAINER_STATE)
    weight_path = (
        None if resuming else resolve_weight_path(cfg.MODEL.WEIGHT)
    )
    if weight_path:
        from cvpr22_cross_modal_pseudo_labeling_tpu.engine.checkpoint import (
            import_external_weights,
        )

        new_params, msg = import_external_weights(
            params["params"], weight_path, cfg
        )
        if msg:
            params = dict(params)
            params["params"] = new_params
            logger.info("%s", msg)

    # skipped on resume like MODEL.WEIGHT: the restore supplies the
    # language table, and a moved weight file or cold URL cache must
    # not abort a resume that never uses it
    if cfg.MODEL.LANGUAGE_WEIGHT and not resuming:
        from cvpr22_cross_modal_pseudo_labeling_tpu.engine.checkpoint import (
            import_language_table,
        )

        lw = resolve_weight_path(cfg.MODEL.LANGUAGE_WEIGHT)
        new_params, report = import_language_table(params["params"], lw)
        params = dict(params)
        params["params"] = jax.tree_util.tree_map(jnp.asarray, new_params)
        logger.info(
            "language table: imported %d leaves from %s",
            report["matched"], lw,
        )

    if meta_arch in ST_FAMILY and not cfg.MODEL.RESUME and not resuming:
        # prepare_model (reference st_generalized_rcnn.py:191-199): at
        # iteration 0 the student starts from a copy of the teacher
        # roi_heads, unless MODEL.RESUME (or an implicit OUTPUT_DIR
        # resume, whose restore supplies the student) continues a
        # previous ST run.
        new_params, n_copied = populate_student_from_teacher(
            params["params"]
        )
        params = dict(params)
        params["params"] = new_params
        logger.info(
            "prepare_model: copied %d teacher leaves into the student",
            n_copied,
        )

    if hasattr(dataset, "class_names") and jax.process_index() == 0:
        from cvpr22_cross_modal_pseudo_labeling_tpu.utils.env_info import (
            save_labels,
        )

        save_labels(dataset.class_names, cfg.OUTPUT_DIR)

    if meta_arch in ST_FAMILY:
        if cfg.MODEL.LANGUAGE_BACKBONE.FT_EMB:
            tokenizer = build_tokenizer(cfg)
            # trainable word embeddings: ship tokenized LVIS names and
            # let the model rebuild the table in-step from live params,
            # differentiably (reference prepare_model every forward,
            # st_generalized_rcnn.py:190-191) — also what keeps a
            # resumed run identical to an uninterrupted one
            name_ids, name_mask = tokenize_class_names(
                lvis_names, tokenizer
            )
            extra_batch["lvis_name_ids"] = name_ids
            extra_batch["lvis_name_mask"] = name_mask
            # drop the init-shape placeholder: the in-step table takes
            # precedence, so don't ship a dead [C, emb] array each step
            extra_batch.pop("lvis_class_embeddings", None)
        elif not resuming:
            extra_batch["lvis_class_embeddings"] = (
                compute_class_name_embeddings(
                    model, params, lvis_names, build_tokenizer(cfg)
                )
            )

    tx, _ = make_optimizer(
        cfg, params["params"], frozen_prefixes_from_cfg(cfg, meta_arch)
    )
    extra_state = None
    if cfg.MODEL.EXEMPLARS_ENABLED and meta_arch in ST_FAMILY:
        # device exemplar table over the LVIS pseudo-label vocabulary
        # (reference update_exemplars memory, st_generalized_rcnn.py:
        # 107-129); lives in state.extra, updated inside the jitted
        # step and checkpointed with the trainer state
        from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector.st_generalized_rcnn import (
            init_exemplar_table,
        )

        extra_state = init_exemplar_table(
            len(lvis_names), cfg.MODEL.ROI_BOX_HEAD.EMB_DIM
        )
        logger.info(
            "exemplar table initialized: %d slots x %d dims",
            len(lvis_names), cfg.MODEL.ROI_BOX_HEAD.EMB_DIM,
        )
    state = create_train_state(
        params, tx, jax.random.PRNGKey(42), extra=extra_state
    )

    if last and cfg.MODEL.LOAD_TRAINER_STATE:
        restored = load_checkpoint(
            last, {"state": jax.device_get(state), "iteration": 0}
        )
        state = restored["state"]
        restored_iter = int(restored["iteration"])
        if restored_iter != start_iter:
            # the tag-file path and the stored iteration should agree by
            # construction (save_checkpoint names the dir by step);
            # trust the checkpoint contents if they ever differ
            logger.warning(
                "checkpoint path says iteration %d but contents say %d; "
                "using %d (loader was sized for %d)",
                start_iter, restored_iter, restored_iter, start_iter,
            )
            start_iter = restored_iter
        logger.info("resumed from %s at iteration %d", last, start_iter)
        if use_stream_state:
            from cvpr22_cross_modal_pseudo_labeling_tpu.engine.trainer import (
                restore_loader_state,
            )

            if restore_loader_state(cfg.OUTPUT_DIR, loader):
                logger.info("data stream resumed from loader_state.json")
        if meta_arch in ST_FAMILY and not cfg.MODEL.LANGUAGE_BACKBONE.FT_EMB:
            # LVIS class-name embeddings from the restored BERT — the
            # table is frozen when FT_EMB is off (engine/optimizer.py),
            # so this equals the fresh-run values computed from the
            # init bundle, without reloading it.  With FT_EMB on, the
            # table is rebuilt in-step from tokenized names (above), so
            # no constant is computed here.
            tokenizer = build_tokenizer(cfg)
            extra_batch["lvis_class_embeddings"] = (
                compute_class_name_embeddings(
                    model, state.params, lvis_names, tokenizer
                )
            )

    mesh = make_mesh(cfg.TPU.MESH_AXES, cfg.TPU.MESH_SHAPE)
    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.train_step import (
        lvis_table_sharding,
        pad_vocab_tables,
    )

    # the example batch must match what DevicePrefetcher._place_batch
    # feeds each step: class tables padded to the 'model'-axis multiple
    # (vocab-parallel at COCO-49 / LVIS-1203 sizes)
    step_fn = jit_train_step(
        build_train_step(
            model, tx, meta_arch,
            grad_accum=cfg.SOLVER.GRADIENT_ACCUMULATION_STEPS,
            lvis_table_sharding=lvis_table_sharding(mesh),
        ),
        mesh,
        pad_vocab_tables({**example_batch, **extra_batch}, mesh),
    )

    # periodic in-training evaluation at SOLVER.TEST_PERIOD (reference
    # engine/trainer.py:174-250): full inference() per TEST dataset,
    # plus the validation-loss pass unless SOLVER.SKIP_VAL_LOSS
    eval_fn = None
    if cfg.DATASETS.TEST and cfg.SOLVER.TEST_PERIOD > 0:
        from cvpr22_cross_modal_pseudo_labeling_tpu.engine.inference import (
            inference,
        )

        val_loaders, val_datasets = make_data_loader(
            cfg,
            is_train=False,
            is_distributed=jax.process_count() > 1,
            rank=jax.process_index(),
            num_replicas=jax.process_count(),
        )
        # eval feeds host-local batches: shard them over this process's
        # devices, never the (possibly cross-process) training mesh
        from cvpr22_cross_modal_pseudo_labeling_tpu.parallel.mesh import (
            local_eval_mesh,
        )

        eval_mesh = local_eval_mesh()
        val_step = None
        if not cfg.SOLVER.SKIP_VAL_LOSS:
            from cvpr22_cross_modal_pseudo_labeling_tpu.engine.train_step import (
                build_val_loss_step,
            )

            val_step = jax.jit(build_val_loss_step(model, meta_arch))
        iou_types = (
            ("bbox",)
            + (("segm",) if cfg.MODEL.MASK_ON else ())
            + (("keypoints",) if cfg.MODEL.KEYPOINT_ON else ())
        )

        def eval_fn(state, iteration):
            for name, loader_t, ds in zip(
                cfg.DATASETS.TEST, val_loaders, val_datasets
            ):
                metrics = inference(
                    model,
                    state.params,
                    loader_t,
                    ds,
                    iou_types=iou_types,
                    expected_results=cfg.TEST.EXPECTED_RESULTS,
                    expected_results_sigma_tol=(
                        cfg.TEST.EXPECTED_RESULTS_SIGMA_TOL
                    ),
                    mesh=eval_mesh,
                )
                logger.info(
                    "iter %d eval[%s]: %s", iteration, name,
                    {
                        k: round(v, 4)
                        for k, v in metrics.items()
                        if isinstance(v, float) and "AP50_class" not in k
                    },
                )
            if val_step is not None:
                import itertools

                losses = []
                for batch, _ in itertools.islice(iter(val_loaders[0]), 8):
                    vb = {
                        k: jnp.asarray(v)
                        for k, v in {**batch, **extra_batch}.items()
                        if isinstance(v, np.ndarray)
                    }
                    out = val_step(state.params, vb)
                    losses.append(float(out["val_total_loss"]))
                if losses:
                    logger.info(
                        "iter %d val_loss %.4f", iteration,
                        float(np.mean(losses)),
                    )

    state = do_train(
        step_fn,
        state,
        loader,
        mesh,
        cfg,
        extra_batch=extra_batch,
        eval_fn=eval_fn,
        output_dir=cfg.OUTPUT_DIR,
        start_iter=start_iter,
    )
    return state, model


def run_test(cfg, model, state, logger):
    import jax

    from cvpr22_cross_modal_pseudo_labeling_tpu.data import make_data_loader
    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.inference import (
        inference,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.parallel.mesh import (
        local_eval_mesh,
    )

    iou_types = (
            ("bbox",)
            + (("segm",) if cfg.MODEL.MASK_ON else ())
            + (("keypoints",) if cfg.MODEL.KEYPOINT_ON else ())
        )
    # post-training eval shards batches over this PROCESS's devices;
    # the multi-host split is the per-process dataset shard + gather
    mesh = local_eval_mesh()
    loaders, datasets = make_data_loader(
        cfg,
        is_train=False,
        is_distributed=jax.process_count() > 1,
        rank=jax.process_index(),
        num_replicas=jax.process_count(),
    )
    for name, loader, dataset in zip(
        cfg.DATASETS.TEST, loaders, datasets
    ):
        metrics = inference(
            model,
            state.params,
            loader,
            dataset,
            iou_types=iou_types,
            expected_results=cfg.TEST.EXPECTED_RESULTS,
            expected_results_sigma_tol=cfg.TEST.EXPECTED_RESULTS_SIGMA_TOL,
            output_file=os.path.join(
                cfg.OUTPUT_DIR, f"predictions_{name}.json"
            ),
            mesh=mesh,
        )
        logger.info("eval[%s]: %s", name, {
            k: round(v, 4) for k, v in metrics.items()
            if isinstance(v, float) and not k.startswith("bbox/AP50_class")
            and not k.startswith("segm/AP50_class")
        })


if __name__ == "__main__":
    main()
