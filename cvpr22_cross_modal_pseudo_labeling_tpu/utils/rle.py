"""COCO mask codec: compressed RLE encode/decode, area, IoU, polygon
rasterization.

pycocotools is not available in this environment; the reference relies
on it throughout (structures/segmentation_mask.py, evaluation/coco).
This module re-implements the public COCO mask format from its spec:
column-major (Fortran) run-length counts, alternating 0-runs/1-runs
starting with zeros, compressed to ASCII with 6-bit LEB128-style chunks
(char = 48 + chunk, bit 0x20 = continuation) and delta coding of counts
from index 2 on.  A C++ drop-in of the hot paths lives in
``native/maskops.cpp`` (used when built; this numpy path is the
fallback and the golden reference for its tests).
"""

from typing import Dict, List, Sequence, Union

import numpy as np

RLE = Dict[str, Union[str, List[int], Sequence[int]]]


def mask_to_counts(mask: np.ndarray) -> np.ndarray:
    """Binary [H, W] mask -> run counts (column-major, starts with the
    zero-run)."""
    flat = np.asarray(mask, np.uint8).flatten(order="F")
    n = flat.size
    if n == 0:
        return np.zeros(0, np.int64)
    change = np.nonzero(np.diff(flat))[0] + 1
    bounds = np.concatenate([[0], change, [n]])
    counts = np.diff(bounds)
    if flat[0] == 1:
        counts = np.concatenate([[0], counts])
    return counts.astype(np.int64)


def counts_to_mask(counts: Sequence[int], h: int, w: int) -> np.ndarray:
    flat = np.zeros(h * w, np.uint8)
    pos = 0
    val = 0
    for c in counts:
        if val:
            flat[pos : pos + int(c)] = 1
        pos += int(c)
        val ^= 1
    return flat.reshape((h, w), order="F")


def compress_counts(counts: Sequence[int]) -> str:
    """LEB128-style 6-bit compression with delta coding (COCO spec)."""
    out = []
    counts = [int(c) for c in counts]
    for i, c in enumerate(counts):
        x = c if i < 2 else c - counts[i - 2]
        more = True
        while more:
            chunk = x & 0x1F
            x >>= 5
            # sign propagation: if x is -1/0 and the sign bit of chunk
            # agrees, we are done
            if chunk & 0x10:
                more = x != -1
            else:
                more = x != 0
            if more:
                chunk |= 0x20
            out.append(chr(chunk + 48))
    return "".join(out)


def decompress_counts(s: Union[str, bytes]) -> List[int]:
    if isinstance(s, bytes):
        s = s.decode("ascii")
    counts: List[int] = []
    i = 0
    while i < len(s):
        x = 0
        shift = 0
        more = True
        while more:
            c = ord(s[i]) - 48
            x |= (c & 0x1F) << shift
            more = bool(c & 0x20)
            i += 1
            if not more and (c & 0x10):
                x |= -1 << (shift + 5)  # sign extend
            shift += 5
        if len(counts) >= 2:
            x += counts[-2]
        counts.append(x)
    return counts


def encode_mask(mask: np.ndarray) -> RLE:
    h, w = mask.shape
    return {
        "size": [int(h), int(w)],
        "counts": compress_counts(mask_to_counts(mask)),
    }


def decode_rle(rle: RLE) -> np.ndarray:
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        counts = decompress_counts(counts)
    return counts_to_mask(counts, h, w)


def rle_area(rle: RLE) -> int:
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        counts = decompress_counts(counts)
    return int(sum(counts[1::2]))


def _rle_to_runs(rle: RLE) -> np.ndarray:
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        counts = decompress_counts(counts)
    return np.asarray(counts, np.int64)


def rle_iou(dt: RLE, gt: RLE, is_crowd: bool = False) -> float:
    """IoU between two RLEs; crowd gt -> intersection over dt area."""
    a = decode_rle(dt).astype(bool)
    b = decode_rle(gt).astype(bool)
    inter = np.logical_and(a, b).sum()
    if is_crowd:
        denom = a.sum()
    else:
        denom = a.sum() + b.sum() - inter
    return float(inter) / max(float(denom), 1e-10)


def rle_iou_matrix(
    dts: Sequence[RLE], gts: Sequence[RLE], iscrowd: Sequence[bool]
) -> np.ndarray:
    """[len(dts), len(gts)] IoU matrix (decodes each mask once)."""
    if not dts or not gts:
        return np.zeros((len(dts), len(gts)), np.float64)
    d_masks = [decode_rle(d).astype(bool) for d in dts]
    g_masks = [decode_rle(g).astype(bool) for g in gts]
    d_areas = [m.sum() for m in d_masks]
    g_areas = [m.sum() for m in g_masks]
    out = np.zeros((len(dts), len(gts)), np.float64)
    for j, (gm, ga, crowd) in enumerate(zip(g_masks, g_areas, iscrowd)):
        for i, (dm, da) in enumerate(zip(d_masks, d_areas)):
            inter = np.logical_and(dm, gm).sum()
            denom = da if crowd else da + ga - inter
            out[i, j] = inter / max(float(denom), 1e-10)
    return out


def merge_rles(rles: Sequence[RLE]) -> RLE:
    """Union of instance masks (used for crowd/polygon multi-part)."""
    mask = decode_rle(rles[0]).astype(bool)
    for r in rles[1:]:
        mask |= decode_rle(r).astype(bool)
    return encode_mask(mask.astype(np.uint8))


def polygons_to_mask(
    polygons: Sequence[Sequence[float]], h: int, w: int
) -> np.ndarray:
    """Rasterizes COCO polygon lists ([x0,y0,x1,y1,...] per part) to a
    binary [H, W] mask (frPyObjects+merge equivalent)."""
    import cv2

    mask = np.zeros((h, w), np.uint8)
    pts = [
        np.asarray(p, np.float64).reshape(-1, 2).round().astype(np.int32)
        for p in polygons
        if len(p) >= 6
    ]
    if pts:
        cv2.fillPoly(mask, pts, 1)
    return mask


def coco_segmentation_to_mask(seg, h: int, w: int) -> np.ndarray:
    """Dispatch: polygons | uncompressed RLE | compressed RLE."""
    if isinstance(seg, list):
        return polygons_to_mask(seg, h, w)
    if isinstance(seg, dict):
        counts = seg["counts"]
        if isinstance(counts, list):
            return counts_to_mask(counts, *seg["size"])
        return decode_rle(seg)
    raise TypeError(f"Unknown segmentation type {type(seg)}")
