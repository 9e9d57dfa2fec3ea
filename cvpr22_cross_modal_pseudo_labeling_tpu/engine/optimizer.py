"""Optimizer construction with reference-parity parameter groups.

Re-design of reference solver/build.py:8-26 on optax:
  * SGD + momentum, torch semantics (weight decay added to the gradient
    before the momentum trace);
  * biases get lr x BIAS_LR_FACTOR and WEIGHT_DECAY_BIAS;
  * ``uncertain_pred`` params get lr x UNCERTAINTY_LR_FACTOR and are
    hard-frozen after UNCERTAINTY_TRAIN_ITER steps
    (st_generalized_rcnn.py:404-406);
  * frozen subtrees (requires_grad=False in the reference — FrozenBN
    tensors, frozen backbone stages, the whole teacher, RPN under
    DONT_TRAIN, emb_pred under FREEZE_EMB_PRED, BERT unless FT_EMB) get
    zero updates via path masks;
  * optional global-norm clipping (SOLVER.CLIP_GRAD_NORM_AT,
    trainer.py:136-138).
"""

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import optax

from ..models.detector import ST_FAMILY

from .lr_schedule import warmup_multistep_schedule


def _path_str(path) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "idx", k))) for k in path
    )


def label_params(params, frozen_prefixes: Sequence[str]):
    """Labels each param: 'frozen' | 'bias' | 'uncertain' | 'default'."""

    def label(path, _):
        p = _path_str(path)
        if "frozen_bn" in p:
            return "frozen"
        for pre in frozen_prefixes:
            if pre in p:
                return "frozen"
        is_bias = p.endswith("/bias") or p == "bias"
        if "uncertain_pred" in p:
            # reference build.py:17-21: bias factors apply FIRST, the
            # uncertainty lr factor multiplies on top — an
            # uncertain_pred bias carries BOTH (found by the solver
            # trajectory oracle, tests/test_solver_oracle.py)
            return "uncertain_bias" if is_bias else "uncertain"
        if is_bias:
            return "bias"
        return "default"

    return jax.tree_util.tree_map_with_path(label, params)


def _freeze_after(inner, freeze_at_step: int):
    """Zeroes updates once the step counter reaches freeze_at_step."""

    def init(params):
        return {"inner": inner.init(params), "count": jnp.zeros((), jnp.int32)}

    def update(updates, state, params=None):
        new_updates, inner_state = inner.update(
            updates, state["inner"], params
        )
        active = state["count"] < freeze_at_step
        new_updates = jax.tree_util.tree_map(
            lambda u: jnp.where(active, u, jnp.zeros_like(u)), new_updates
        )
        return new_updates, {
            "inner": inner_state,
            "count": state["count"] + 1,
        }

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg, params, frozen_prefixes: Sequence[str] = ()):
    """Returns (optax transform, label tree). ``frozen_prefixes`` are
    path substrings to freeze (backbone stages, teacher, rpn...)."""
    s = cfg.SOLVER
    schedule = warmup_multistep_schedule(
        s.BASE_LR,
        s.STEPS,
        s.GAMMA,
        s.WARMUP_FACTOR,
        s.WARMUP_ITERS,
        s.WARMUP_METHOD,
    )

    def sgd_group(lr_factor: float, weight_decay: float):
        chain = []
        if weight_decay > 0:
            chain.append(optax.add_decayed_weights(weight_decay))
        chain.append(optax.trace(decay=s.MOMENTUM, nesterov=False))
        chain.append(optax.scale_by_schedule(lambda c: -schedule(c) * lr_factor))
        return optax.chain(*chain)

    def uncertain_group(lr_factor, weight_decay):
        g = sgd_group(lr_factor, weight_decay)
        if cfg.MODEL.UNCERTAINTY and cfg.MODEL.UNCERTAINTY_TRAIN_ITER > 0:
            g = _freeze_after(g, cfg.MODEL.UNCERTAINTY_TRAIN_ITER)
        return g

    labels = label_params(params, frozen_prefixes)
    tx = optax.multi_transform(
        {
            "frozen": optax.set_to_zero(),
            "default": sgd_group(1.0, s.WEIGHT_DECAY),
            "bias": sgd_group(float(s.BIAS_LR_FACTOR), float(s.WEIGHT_DECAY_BIAS)),
            "uncertain": uncertain_group(
                s.UNCERTAINTY_LR_FACTOR, s.WEIGHT_DECAY
            ),
            # bias factors compose with the uncertainty factor
            # (reference build.py:17-21 applies both)
            "uncertain_bias": uncertain_group(
                s.UNCERTAINTY_LR_FACTOR * float(s.BIAS_LR_FACTOR),
                float(s.WEIGHT_DECAY_BIAS),
            ),
        },
        labels,
    )
    if s.CLIP_GRAD_NORM_AT > 0:
        # frozen params (requires_grad=False in the reference) carry no
        # gradient in torch and so contribute NOTHING to the
        # clip_grad_norm_ global norm (trainer.py:136-138); zero their
        # grads before the norm or the clip scale diverges (MMSS clips
        # at 5.0 with the whole language backbone frozen)
        zero_frozen = optax.masked(
            optax.set_to_zero(),
            jax.tree_util.tree_map(lambda l: l == "frozen", labels),
        )
        tx = optax.chain(
            zero_frozen, optax.clip_by_global_norm(s.CLIP_GRAD_NORM_AT), tx
        )
    if s.GRADIENT_ACCUMULATION_STEPS > 1:
        # true accumulation (trainer.py:118,135): gradients average over
        # k micro-steps, the update applies on the k-th
        tx = optax.MultiSteps(
            tx, every_k_schedule=s.GRADIENT_ACCUMULATION_STEPS
        )
    return tx, labels


def frozen_prefixes_from_cfg(cfg, meta_arch: str = "GeneralizedRCNN"):
    """Path substrings that must receive zero updates, mirroring the
    reference's requires_grad=False sites."""
    prefixes = []
    freeze_at = cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT
    if freeze_at > 0:
        prefixes.append("backbone/body/stem")
        for i in range(1, freeze_at):
            prefixes.append(f"backbone/body/layer{i}")
    if cfg.MODEL.RPN.DONT_TRAIN:
        prefixes.append("rpn_head")
    if cfg.MODEL.ROI_BOX_HEAD.FREEZE_EMB_PRED:
        prefixes.append("emb_pred")
    if cfg.MODEL.ROI_BOX_HEAD.FREEZE_FEATURE_EXTRACTOR:
        prefixes.append("roi_extractor")
    if meta_arch in ST_FAMILY:
        # backbone + whole teacher frozen (st_generalized_rcnn.py:59-67)
        prefixes.append("backbone/")
        prefixes.append("teacher/")
        if not cfg.MODEL.LANGUAGE_BACKBONE.FT_EMB:
            prefixes.append("bert/")
    if meta_arch == "MMSS-GCNN":
        if cfg.MODEL.LANGUAGE_BACKBONE.FREEZE:
            prefixes.append("language_backbone/")
    return tuple(prefixes)
