"""Paper-comparison baseline detectors (reference
modeling/detector/baselines/**, ~3.4k LoC of UNregistered code — only
reachable upstream by editing detectors.py; registered and tested
here).

* ``SoftTeacherRCNN`` — pseudo-labels are the TOP-2 MOST-CONFIDENT
  regions scored against the whole caption vocabulary (per-region
  softmax over words, max over words, top-2 regions;
  soft_teacher.py:137-160) instead of the per-word argmax; each pseudo
  target carries a ``weights`` field (sigmoid confidence) that scales
  the matched rois' classification loss (its loss.py:75-78, 188-196).
* ``UnbiasedTeacherRCNN`` — same top-2 selection; the pseudo branch's
  class-weighted CE gets the focal reweight (1 - e^{-CE})^gamma with
  gamma = 1.5 and the factor detached (its loss.py:61, 193-197).
* ``SBBaseline`` / ``OMPBaseline`` / ``BARPNBaseline`` — plain
  GeneralizedRCNN skeletons with a frozen RPN option (SB/SB.py:16-89,
  OMP/OMP.py:30-88, BA_RPN/BA_RPN.py:16-89); their only delta from
  GeneralizedRCNN is the dummy-loss try/except, which the masked-branch
  design makes unnecessary.

The reference stores the selected word INDEX as the pseudo label
(soft_teacher.py:155 ``ids_cap = selected_cls``) even though the
student classifies over the LVIS vocabulary; here the index is mapped
through ``cap_labels`` to the LVIS category id, preserving the intended
semantics on the student's vocabulary.
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp

from .generalized_rcnn import GeneralizedRCNN
from .st_generalized_rcnn import STGeneralizedRCNN


class _TopKTeacherRCNN(STGeneralizedRCNN):
    """Shared top-k confident-region pseudo-labeling."""

    top_k: int = 2

    def generate_pseudo_labels(
        self,
        feats,
        proposals,
        image_sizes,
        cap_tok_ids,
        cap_tok_mask,
        cap_word_valid,
        cap_labels=None,
    ):
        sb = self.statics.base
        b, p = proposals.boxes.shape[:2]
        emb, reg_boxes, region_scores = self._teacher_region_scores(
            feats, proposals, image_sizes, cap_tok_ids, cap_tok_mask
        )
        # per-region softmax over the caption vocabulary, invalid words
        # masked out (soft_teacher.py:139-141)
        region_scores = jnp.where(
            cap_word_valid[:, None, :], region_scores, -jnp.inf
        )
        region_prop = jax.nn.softmax(region_scores, axis=-1)
        region_prop = jnp.where(
            cap_word_valid[:, None, :], region_prop, 0.0
        )
        vs = jnp.max(region_prop, axis=-1)  # [B, P] confidence
        cls_idx = jnp.argmax(region_prop, axis=-1)  # [B, P] word index
        vs = jnp.where(proposals.valid, vs, -jnp.inf)

        top_vs, top_idx = jax.lax.top_k(vs, self.top_k)  # [B, k]
        take = lambda a: jnp.take_along_axis(
            a,
            top_idx[..., None] if a.ndim == 3 else top_idx,
            axis=1,
        )
        pseudo_boxes = take(reg_boxes)
        pseudo_embs = take(emb)
        word_idx = take(cls_idx)  # [B, k]
        scores = jax.nn.sigmoid(top_vs)
        any_word = jnp.any(cap_word_valid, axis=1, keepdims=True)
        valid = jnp.isfinite(top_vs) & any_word
        if cap_labels is not None:
            labels = jnp.take_along_axis(cap_labels, word_idx, axis=1)
        else:
            labels = word_idx
        out = {
            "boxes": pseudo_boxes,
            "scores": scores,
            "embs": pseudo_embs,
            "valid": valid,
            "labels": labels,
            "weights": scores,  # sigmoid confidence (soft_teacher.py:151)
        }
        if sb.mask_on:
            out["masks"] = self._teacher_masks(feats, pseudo_boxes, b)
        return jax.tree_util.tree_map(jax.lax.stop_gradient, out)


class SoftTeacherRCNN(_TopKTeacherRCNN):
    def _pseudo_loss_extras(self, pseudo) -> Dict[str, Any]:
        return {"sample_weight_table": pseudo["weights"]}


class UnbiasedTeacherRCNN(_TopKTeacherRCNN):
    focal_gamma: float = 1.5  # unbiased_teacher loss.py:61

    def _pseudo_loss_extras(self, pseudo) -> Dict[str, Any]:
        return {"focal_gamma": self.focal_gamma}


class SBBaseline(GeneralizedRCNN):
    pass


class OMPBaseline(GeneralizedRCNN):
    pass


class BARPNBaseline(GeneralizedRCNN):
    pass
