"""10-step training-trajectory oracle for the STUDENT-TEACHER stack.

test_e2e_trajectory_parity.py pins the GeneralizedRCNN (teacher
training) trajectory; this file pins the paper's actual workload:
STGeneralizedRCNN distillation (st_generalized_rcnn.py:284-408) taking
10 REAL optimizer steps on both stacks from the same .pth —
reference: its own frozen-teacher forward + torch SGD over the
requires_grad-filtered param groups (solver/build.py:12-14 skips the
frozen backbone/RPN/teacher, st_generalized_rcnn.py:59-67) + its own
WarmupMultiStepLR; ours: the optax chain with
frozen_prefixes_from_cfg("STGeneralizedRCNN").

Because backbone, RPN and the whole teacher are frozen, the pseudo
labels are CONSTANT across steps and the trajectory is smooth in the
student parameters — so with the mask branch off every gradient source
matches and the loop is a SHARP solver oracle for the ST param-group
layout (is the teacher really excluded? does lambda_pseudo_label scale
the pseudo grads identically? do the student bias groups get lr x2?).
With masks on, the documented target-projection convention gap
(tests/test_mask_projection_gap.py) feeds the student's shared C5
trunk, so that variant BOUNDS drift instead of asserting parity,
mirroring test_ten_step_trajectory_with_masks_bounded_drift.

The reference composite step runs its forward twice at batch 1 (one
caption image, one detection image — the reference crashes on mixed
batches >= 2, see test_e2e_st_parity.py) and takes ONE optimizer step
on the summed losses; ours runs its native mixed batch of 2.  Per-key
loss parity between those two framings is what test_st_training_loss
_parity already pins at step 0; here the equality must survive the
closed loop weights -> losses -> SGD -> weights.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_oracle import install_reference_full
from test_reference_parity import _randomize_state_dict
from test_e2e_reference_parity import _tame_state_dict
from test_e2e_st_parity import (
    CAP_IDS,
    CAP_WORDS,
    EMB_DIM,
    IMG_H,
    IMG_W,
    N_GT_ST,
    NUM_CLASSES,
    VOCAB,
    _patch_reference_bert,
    _st_train_cfgs,
    tokenize_words,
)

pytestmark = pytest.mark.slow

N_STEPS = 10
BASE_LR = 1e-4
WARMUP_ITERS = 4
MILESTONES = (6,)

PSEUDO_KEYS = ("loss_classifier_pseudo", "loss_box_reg_pseudo")
GT_KEYS = ("loss_classifier", "loss_box_reg")
MASK_KEYS = ("loss_mask_pseudo", "loss_mask")


def _solver_overrides(c):
    c.SOLVER.BASE_LR = BASE_LR
    c.SOLVER.MOMENTUM = 0.9
    c.SOLVER.WEIGHT_DECAY = 1e-4
    c.SOLVER.WEIGHT_DECAY_BIAS = 0.0
    c.SOLVER.BIAS_LR_FACTOR = 2
    c.SOLVER.WARMUP_ITERS = WARMUP_ITERS
    c.SOLVER.WARMUP_FACTOR = 1.0 / 3
    c.SOLVER.WARMUP_METHOD = "linear"
    c.SOLVER.STEPS = MILESTONES
    c.SOLVER.GAMMA = 0.1
    return c


def _fixture_arrays():
    """Images + caption/detection targets shared by both stacks
    (same recipe as test_st_training_loss_parity)."""
    rng = np.random.RandomState(11)
    img_cap = rng.randn(3, IMG_H, IMG_W).astype(np.float32)
    img_det = rng.randn(3, IMG_H, IMG_W).astype(np.float32)
    gb = np.array(
        [[10.0, 8.0, 60.0, 50.0], [50.0, 30.0, 120.0, 90.0],
         [4.0, 60.0, 40.0, 92.0]],
        np.float32,
    )
    gl = np.array([1, 2, 4], np.int64)
    gm = np.zeros((N_GT_ST, IMG_H, IMG_W), np.uint8)
    for i, (x1, y1, x2, y2) in enumerate(gb):
        gm[i, int(y1) + 2 : int(y2) - 3, int(x1) + 3 : int(x2) - 4] = 1
    return img_cap, img_det, gb, gl, gm


def _reference_st_trajectory(tmp_path_factory, mask_on):
    build = install_reference_full()
    _patch_reference_bert()
    import importlib

    ra_mod = importlib.import_module("maskrcnn_benchmark.layers.roi_align")
    from ref_native import roi_align_torch

    orig_forward = ra_mod.ROIAlign.forward

    def _differentiable_forward(self, input, rois):
        size = self.output_size
        ph, pw = (size, size) if isinstance(size, int) else (
            size[0], size[-1]
        )
        return roi_align_torch(
            input, rois, self.spatial_scale, ph, pw, self.sampling_ratio
        )

    # the reference ships no CPU roi_align backward (csrc is CUDA-only):
    # route student pooling through the validated pure-torch
    # transcription so autograd can derive the exact backward
    ra_mod.ROIAlign.forward = _differentiable_forward

    from maskrcnn_benchmark.solver.build import (
        make_lr_scheduler,
        make_optimizer,
    )
    from maskrcnn_benchmark.structures.bounding_box import BoxList
    from maskrcnn_benchmark.structures.image_list import to_image_list
    from maskrcnn_benchmark.structures.segmentation_mask import (
        SegmentationMask,
    )

    rc, _ = _st_train_cfgs()
    rc = _solver_overrides(rc)
    rc.MODEL.MASK_ON = mask_on
    ref_model = build(rc)
    rng = np.random.RandomState(11)
    orig = ref_model.state_dict()
    ref_model.load_state_dict(
        _tame_state_dict(_randomize_state_dict(orig, rng), orig)
    )
    ref_model.train()

    class_emb = (0.3 * rng.randn(NUM_CLASSES, EMB_DIM)).astype(np.float32)
    ref_model.roi_heads.box.predictor.set_class_embeddings(
        torch.from_numpy(class_emb)
    )
    ref_model.class_names = [f"c{i}" for i in range(NUM_CLASSES)]

    img_cap, img_det, gb, gl, gm = _fixture_arrays()

    t_cap = BoxList(torch.zeros((len(CAP_WORDS), 4)), (IMG_W, IMG_H))
    t_cap.add_field("ids_cap", torch.tensor(CAP_IDS))
    t_cap.add_field("nn_caption", "/".join(CAP_WORDS))
    t_cap.add_field("is_det", "No")
    t_cap.add_field("labels", torch.tensor(CAP_IDS))

    t_det = BoxList(torch.from_numpy(gb), (IMG_W, IMG_H))
    t_det.add_field("labels", torch.from_numpy(gl))
    t_det.add_field(
        "masks",
        SegmentationMask(torch.from_numpy(gm), (IMG_W, IMG_H), mode="mask"),
    )
    t_det.add_field("nn_caption", "")
    t_det.add_field("is_det", "Yes")

    # trigger prepare_model's one-time teacher->student copy (iter 0,
    # st_generalized_rcnn.py:197-199) BEFORE saving the .pth, so both
    # stacks start the loop from the same copied student
    ref_model.prepare_model()
    pth = tmp_path_factory.mktemp("st_traj") / "model.pth"
    torch.save(ref_model.state_dict(), str(pth))
    lvis_embs = ref_model.cap_embs.detach().numpy().copy()

    optimizer = make_optimizer(rc, ref_model)
    scheduler = make_lr_scheduler(rc, optimizer)
    keys = PSEUDO_KEYS + GT_KEYS + (MASK_KEYS if mask_on else ())
    ref_traj = []
    try:
        for _ in range(N_STEPS):
            cap_losses = ref_model(
                to_image_list([torch.from_numpy(img_cap)], 32), [t_cap]
            )
            det_losses = ref_model(
                to_image_list([torch.from_numpy(img_det)], 32), [t_det]
            )
            # one composite step: the cap forward's det-branch entries
            # and vice versa are the dummy-loss trick's exact zeros
            # (st_generalized_rcnn.py:277-282), so this total equals
            # our mixed-batch total
            total = sum(cap_losses.values()) + sum(det_losses.values())
            optimizer.zero_grad()
            total.backward()
            optimizer.step()
            scheduler.step()
            step_losses = {}
            for k in keys:
                src = cap_losses if k.endswith("_pseudo") else det_losses
                step_losses[k] = float(src[k].detach())
            ref_traj.append(step_losses)
    finally:
        ra_mod.ROIAlign.forward = orig_forward

    return {
        "pth": str(pth),
        "class_emb": class_emb,
        "lvis_embs": lvis_embs,
        "ref_traj": ref_traj,
    }


@pytest.fixture(scope="module")
def st_trajectory_boxes_only(tmp_path_factory):
    return _reference_st_trajectory(tmp_path_factory, mask_on=False)


@pytest.fixture(scope="module")
def st_trajectory_with_masks(tmp_path_factory):
    return _reference_st_trajectory(tmp_path_factory, mask_on=True)


def _our_st_trajectory(setup, mask_on):
    from cvpr22_cross_modal_pseudo_labeling_tpu.data.datasets.coco import (
        rasterize_instance_mask,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.checkpoint import (
        import_torch_state_dict,
        load_torch_checkpoint,
        populate_student_from_teacher,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.optimizer import (
        frozen_prefixes_from_cfg,
        make_optimizer,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector.st_generalized_rcnn import (
        STGeneralizedRCNN,
        st_statics_from_cfg,
    )

    _, oc = _st_train_cfgs()
    oc = _solver_overrides(oc)
    oc.MODEL.MASK_ON = mask_on

    img_cap, img_det, gb, gl, gm = _fixture_arrays()
    lvis_embs = setup["lvis_embs"]

    statics = st_statics_from_cfg(oc)._replace(
        vocab_size=len(VOCAB), lvis_vocab=lvis_embs.shape[0]
    )
    model = STGeneralizedRCNN(statics)

    ids, mask = tokenize_words(CAP_WORDS)
    nw = len(CAP_WORDS)
    polys = []
    for x1, y1, x2, y2 in gb:
        ix1, iy1 = int(x1) + 3, int(y1) + 2
        ix2, iy2 = int(x2) - 4, int(y2) - 3
        polys.append([[ix1, iy1, ix2, iy1, ix2, iy2, ix1, iy2]])
    local = np.stack(
        [
            rasterize_instance_mask(polys[i], gb[i], (IMG_H, IMG_W), 28)
            for i in range(N_GT_ST)
        ]
    )
    batch = {
        "cap_mask": jnp.array([True, False]),
        "det_mask": jnp.array([False, True]),
        "cap_tok_ids": jnp.asarray(np.stack([ids, np.zeros_like(ids)])),
        "cap_tok_mask": jnp.asarray(np.stack([mask, np.zeros_like(mask)])),
        "cap_word_valid": jnp.array([[True] * nw, [False] * nw]),
        "cap_labels": jnp.asarray(
            np.stack([np.asarray(CAP_IDS), np.zeros(nw)]).astype(np.int32)
        ),
        "gt_boxes": jnp.asarray(np.stack([np.zeros_like(gb), gb])),
        "gt_labels": jnp.asarray(
            np.stack([np.zeros_like(gl), gl]).astype(np.int32)
        ),
        "gt_valid": jnp.array([[False] * N_GT_ST, [True] * N_GT_ST]),
        "gt_masks": jnp.asarray(
            np.stack([np.zeros_like(local), local]).astype(np.float32)
        ),
    }
    images_j = jnp.asarray(
        np.stack([img_cap.transpose(1, 2, 0), img_det.transpose(1, 2, 0)])
    )
    sizes = jnp.array([[IMG_H, IMG_W]] * 2, jnp.int32)
    class_emb = jnp.asarray(setup["class_emb"])
    lvis_j = jnp.asarray(lvis_embs)

    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        images_j,
        sizes,
        batch,
        class_emb,
        lvis_j,
        train=True,
    )
    sd = load_torch_checkpoint(setup["pth"])
    new_params, _ = import_torch_state_dict(params["params"], sd)
    new_params, _ = populate_student_from_teacher(new_params)

    tx, _ = make_optimizer(
        oc,
        new_params,
        frozen_prefixes_from_cfg(oc, meta_arch="STGeneralizedRCNN"),
    )
    opt_state = tx.init(new_params)

    def loss_fn(p):
        out = model.apply(
            {"params": p},
            images_j,
            sizes,
            batch,
            class_emb,
            lvis_j,
            train=True,
            rngs={"sampler": jax.random.PRNGKey(2)},
        )
        return sum(out.losses.values()), out.losses

    @jax.jit
    def step(p, s):
        grads, losses = jax.grad(loss_fn, has_aux=True)(p)
        updates, s = tx.update(grads, s, p)
        import optax

        return optax.apply_updates(p, updates), s, losses

    p = new_params
    our_traj = []
    for _ in range(N_STEPS):
        p, opt_state, losses = step(p, opt_state)
        our_traj.append({k: float(v) for k, v in losses.items()})
    return our_traj


def test_st_ten_step_trajectory_boxes_only(st_trajectory_boxes_only):
    """Sharp ST solver oracle: masks off, teacher frozen, samplers keep
    everything -> a param-group slip on the STUDENT side (teacher not
    excluded, lambda_pseudo_label scaling wrong, bias lr group missing)
    compounds far past this envelope by step 10."""
    setup = st_trajectory_boxes_only
    our_traj = _our_st_trajectory(setup, mask_on=False)
    ref_traj = setup["ref_traj"]
    assert set(our_traj[0]) >= set(ref_traj[0]), (
        set(ref_traj[0]) - set(our_traj[0])
    )
    for i, (ref, ours) in enumerate(zip(ref_traj, our_traj)):
        for k in ref:
            # single-step ST parity holds at 2e-2 (frozen-teacher fp
            # accumulation); allow it to compound linearly
            tol = 2e-2 * (1 + i)
            assert abs(ours[k] - ref[k]) <= tol * max(1.0, abs(ref[k])), (
                f"step {i} {k}: ours {ours[k]:.6f} vs ref {ref[k]:.6f} "
                f"(tol {tol})"
            )


def test_st_ten_step_trajectory_with_masks_bounded_drift(
    st_trajectory_with_masks,
):
    """Masks on: the projection-convention gap perturbs the student's
    shared C5 trunk each step; bound the separation instead of
    asserting parity (same framing as the GeneralizedRCNN variant)."""
    setup = st_trajectory_with_masks
    our_traj = _our_st_trajectory(setup, mask_on=True)
    ref_traj = setup["ref_traj"]
    assert set(our_traj[0]) >= set(ref_traj[0]), (
        set(ref_traj[0]) - set(our_traj[0])
    )
    for i, (ref, ours) in enumerate(zip(ref_traj, our_traj)):
        for k in ref:
            tol = (0.15 if "mask" in k else 2e-2) + 0.03 * i
            assert abs(ours[k] - ref[k]) <= tol * max(1.0, abs(ref[k])), (
                f"step {i} {k}: ours {ours[k]:.6f} vs ref {ref[k]:.6f} "
                f"(tol {tol})"
            )
    ref_tot0 = sum(ref_traj[0].values())
    ref_totN = sum(ref_traj[-1].values())
    our_totN = sum(
        v for k, v in our_traj[-1].items() if k in ref_traj[-1]
    )
    assert abs(our_totN - ref_totN) <= 0.2 * max(1.0, abs(ref_totN))
    # both stacks agree on the training direction over the window
    assert (our_totN - ref_tot0) * (ref_totN - ref_tot0) >= 0.0
