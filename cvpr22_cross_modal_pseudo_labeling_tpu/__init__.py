"""TPU-native open-vocabulary instance segmentation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
hbdat/cvpr22_cross_modal_pseudo_labeling ("Open-Vocabulary Instance
Segmentation via Robust Cross-Modal Pseudo-Labeling", CVPR 2022):

- embedding-based open-vocabulary Mask R-CNN (teacher),
- multimedia self-supervised image-caption grounding pretraining (MMSS),
- teacher->student cross-modal pseudo-labeling with uncertainty-weighted
  mask distillation (student).

Everything in the compute path is functional, statically shaped, and
compiles under ``jax.jit``/``pjit`` over a ``jax.sharding.Mesh``; the hot
ops (RoIAlign, NMS) have Pallas TPU kernels with pure-XLA fallbacks.
"""

__version__ = "0.1.0"
