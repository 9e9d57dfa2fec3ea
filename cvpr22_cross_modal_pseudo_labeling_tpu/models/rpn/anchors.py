"""Anchor generation (host-side numpy precompute, device visibility).

Re-derivation of the Detectron anchor enumeration
(reference: maskrcnn_benchmark/modeling/rpn/anchor_generator.py:220-289)
and the grid/visibility logic (anchor_generator.py:74-127).  Anchors for
a given feature-map shape are a static constant baked into the compiled
program; per-image visibility is the only device computation.

Layout: anchors for one level are ordered (y, x, a) — identical to the
reference's permute(0,2,3,1).reshape(-1) prediction flattening and to a
NHWC conv output reshape, so predictions and anchors align with no
transposition.
"""

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def _whctrs(anchor):
    w = anchor[2] - anchor[0] + 1
    h = anchor[3] - anchor[1] + 1
    return w, h, anchor[0] + 0.5 * (w - 1), anchor[1] + 0.5 * (h - 1)


def _mkanchors(ws, hs, x_ctr, y_ctr):
    ws = ws[:, None]
    hs = hs[:, None]
    return np.hstack(
        (
            x_ctr - 0.5 * (ws - 1),
            y_ctr - 0.5 * (hs - 1),
            x_ctr + 0.5 * (ws - 1),
            y_ctr + 0.5 * (hs - 1),
        )
    )


def generate_cell_anchors(
    stride: int,
    sizes: Sequence[float],
    aspect_ratios: Sequence[float],
) -> np.ndarray:
    """Base anchors centered on the (0,0) cell: [A, 4] float32.

    Matches generate_anchors (anchor_generator.py:220-231): a
    (0, 0, stride-1, stride-1) window enumerated over ratios (with the
    Detectron rounding) then scales.
    """
    scales = np.array(sizes, np.float64) / stride
    ratios = np.array(aspect_ratios, np.float64)
    base = np.array([1, 1, stride, stride], np.float64) - 1

    w, h, x_ctr, y_ctr = _whctrs(base)
    size = w * h
    ws = np.round(np.sqrt(size / ratios))
    hs = np.round(ws * ratios)
    ratio_anchors = _mkanchors(ws, hs, x_ctr, y_ctr)

    out = []
    for i in range(ratio_anchors.shape[0]):
        w, h, x_ctr, y_ctr = _whctrs(ratio_anchors[i])
        out.append(_mkanchors(w * scales, h * scales, x_ctr, y_ctr))
    return np.vstack(out).astype(np.float32)


def grid_anchors(
    feature_hw: Tuple[int, int],
    stride: int,
    cell_anchors: np.ndarray,
) -> np.ndarray:
    """[H*W*A, 4] anchors over the feature grid, (y, x, a) order
    (anchor_generator.py:74-96)."""
    h, w = feature_hw
    shifts_x = np.arange(0, w * stride, stride, np.float32)
    shifts_y = np.arange(0, h * stride, stride, np.float32)
    sx, sy = np.meshgrid(shifts_x, shifts_y)  # [h, w]
    shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)
    return (shifts + cell_anchors[None]).reshape(-1, 4)


def anchor_visibility(
    anchors: jnp.ndarray,
    image_size: jnp.ndarray,
    straddle_thresh: float = 0.0,
) -> jnp.ndarray:
    """Per-image anchor visibility mask (anchor_generator.py:98-111).
    image_size = (h, w)."""
    if straddle_thresh < 0:
        return jnp.ones(anchors.shape[:-1], bool)
    h = image_size[0].astype(anchors.dtype)
    w = image_size[1].astype(anchors.dtype)
    return (
        (anchors[..., 0] >= -straddle_thresh)
        & (anchors[..., 1] >= -straddle_thresh)
        & (anchors[..., 2] < w + straddle_thresh)
        & (anchors[..., 3] < h + straddle_thresh)
    )


def build_anchors_for_levels(
    feature_shapes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    sizes: Sequence[float],
    aspect_ratios: Sequence[float],
):
    """Returns a list of [H*W*A, 4] jnp anchor arrays, one per level.

    Single-stride configs use all sizes on the one level (C4 RPN);
    multi-stride (FPN) assigns one size per level
    (anchor_generator.py:128-160 builders).
    """
    # one stride per feature level, or everything silently misaligns:
    # a zip-truncated anchor list makes downstream top-k gathers index
    # out of range (XLA clamps, yielding garbage proposals).  The
    # reference asserts this in its anchor generator config check.
    if len(feature_shapes) != len(strides):
        raise ValueError(
            f"{len(feature_shapes)} feature levels but "
            f"{len(strides)} anchor strides — set MODEL.RPN.ANCHOR_STRIDE "
            f"to one stride per FPN level"
        )
    out = []
    if len(strides) == 1:
        cells = [generate_cell_anchors(strides[0], sizes, aspect_ratios)]
    else:
        assert len(strides) == len(sizes), "FPN: #strides must match #sizes"
        cells = [
            generate_cell_anchors(
                s, sz if isinstance(sz, (tuple, list)) else (sz,), aspect_ratios
            )
            for s, sz in zip(strides, sizes)
        ]
    for shape, stride, cell in zip(feature_shapes, strides, cells):
        out.append(jnp.asarray(grid_anchors(shape, stride, cell)))
    return out
