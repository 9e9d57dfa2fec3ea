"""Checkpointing: orbax save/resume + torch/Caffe2 weight import.

Re-design of the reference DetectronCheckpointer
(reference: maskrcnn_benchmark/utils/checkpoint.py:13-154 and
utils/model_serialization.py:10-67):

* native checkpoints — orbax: model/optimizer/step saved per
  CHECKPOINT_PERIOD, a ``last_checkpoint`` tag file enables implicit
  resume (checkpoint.py:34-57); MODEL.LOAD_TRAINER_STATE gates restoring
  the optimizer (train_net.py:86-88).
* cross-framework import — a torch ``state_dict`` (the released teacher
  / MMSS .pth files) is translated into the flax param tree with the
  reference's key surgery applied first:
    - MODEL.BACKBONE_PREFIX strip (checkpoint.py:118-119),
    - ``mmss_heads.<DEFAULT_HEAD>.v2l_projection`` ->
      ``emb_pred`` when LOAD_EMB_PRED_FROM_MMSS_HEAD
      (checkpoint.py:120-122),
    - classifier dropped unless LOAD_CLASSIFIER (checkpoint.py:125-126);
  then by longest-suffix matching against our param paths
  (model_serialization.py:10-67) with layout transposes (OIHW->HWIO
  convs, [in,out,kh,kw]->[kh,kw,in,out] transposed convs, 2-D linear
  transpose) resolved by target shape.
"""

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


# ---------------------------------------------------------------------------
# orbax native checkpoints
# ---------------------------------------------------------------------------

_async_ckptr = None
_pending = None  # (directory, path, keep, extras) of an in-flight save


def _finalize(directory: str, path: str, keep: int, extras=None):
    """Publishes a completed checkpoint: last_checkpoint tag + prune,
    plus any staged sidecar files (``extras``: path -> content, e.g.
    the grain loader-state snapshot taken at the SAME iteration as the
    save).  Sidecars publish here, atomically with the tag, never at
    save-start: a loader state written eagerly would run one checkpoint
    period ahead of the tag, and a crash in that window would resume
    the stream past batches the restored params never trained on.
    Sidecars are per-process files (each host's stream position);
    the tag/prune is primary-host only (every process calls save —
    orbax coordinates a single writer via a cross-process barrier —
    but the tag file and prune must happen once)."""
    for p, content in (extras or {}).items():
        with open(p, "w") as f:
            f.write(content)
    if jax.process_index() != 0:
        return
    with open(os.path.join(directory, "last_checkpoint"), "w") as f:
        f.write(path)
    cks = sorted(
        d for d in os.listdir(directory) if d.startswith("model_")
    )
    for old in cks[:-keep]:
        import shutil

        shutil.rmtree(os.path.join(directory, old), ignore_errors=True)


def flush_pending_checkpoint():
    """Waits for an in-flight async save and publishes it."""
    global _pending
    if _pending is None:
        return
    _async_ckptr.wait_until_finished()
    _finalize(*_pending)
    _pending = None


def pending_checkpoint_step():
    """Step of the in-flight async save, or None."""
    if _pending is None:
        return None
    return int(os.path.basename(_pending[1]).rsplit("_", 1)[-1])


def discard_pending_checkpoint():
    """Waits for an in-flight async save and drops it WITHOUT
    publishing: last_checkpoint keeps pointing at the previous published
    save.  Used on divergence abort — a checkpoint written after the
    last finite loss observation may hold NaN params, and publishing it
    would make the implicit resume restore the blow-up."""
    global _pending
    if _pending is None:
        return
    _async_ckptr.wait_until_finished()
    directory, path = _pending[0], _pending[1]
    _pending = None
    if jax.process_index() == 0 and os.path.isdir(path):
        import shutil

        shutil.rmtree(path, ignore_errors=True)


def save_checkpoint(
    directory: str, state, step: int, keep: int = 5, block: bool = True,
    extras=None,
):
    """``block=False`` pipelines the orbax write with training: the save
    starts in the background and is published (last_checkpoint tag +
    prune + ``extras`` sidecar files) by the NEXT save or an explicit
    flush_pending_checkpoint(), so the tag never points at an unfinished
    checkpoint and sidecars never outrun it.  The reference blocks on
    torch.save at every CHECKPOINT_PERIOD (checkpoint.py:34-52);
    multi-GB states make that a visible training stall."""
    global _async_ckptr, _pending
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"model_{step:07d}")
    if _async_ckptr is None:
        _async_ckptr = ocp.StandardCheckpointer()
    flush_pending_checkpoint()
    _async_ckptr.save(path, jax.device_get(state), force=True)
    if block:
        _async_ckptr.wait_until_finished()
        _finalize(directory, path, keep, extras)
    else:
        _pending = (directory, path, keep, extras)
    return path


def latest_checkpoint(directory: str) -> Optional[str]:
    tag = os.path.join(directory, "last_checkpoint")
    if os.path.exists(tag):
        with open(tag) as f:
            path = f.read().strip()
        if os.path.exists(path):
            return path
    return None


def load_checkpoint(path: str, target_state=None):
    """Restores an orbax checkpoint.  With ``target_state=None`` the
    raw on-disk tree is returned as nested dicts/arrays — eval-side
    callers (tools/test_net.py) that only need ``state.params`` use
    this rather than reconstructing the full TrainState (optimizer,
    rngs) just to satisfy structure matching."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if target_state is None:
        return ckptr.restore(path)
    try:
        return ckptr.restore(path, target=jax.device_get(target_state))
    except ValueError as e:
        if "do not match" not in str(e):
            raise
        # orbax's mismatch error dumps both full pytrees (thousands of
        # lines of MaskedNode spam); surface the actionable part: the
        # on-disk state was written by a different model/optimizer
        # layout (config change or older code), so it cannot resume
        # this run
        first = str(e).splitlines()[:2]
        raise RuntimeError(
            f"checkpoint {path} does not match the current "
            "model/optimizer structure (it was saved by a different "
            "config or code version). Start from a fresh OUTPUT_DIR, "
            "or load weights only via MODEL.WEIGHT / "
            "MODEL.LOAD_TRAINER_STATE=False. First mismatch: "
            + " ".join(ln.strip() for ln in first)[:300]
        ) from None


# ---------------------------------------------------------------------------
# torch -> flax import
# ---------------------------------------------------------------------------

def _flatten_params(params) -> Dict[Tuple[str, ...], np.ndarray]:
    flat = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        else:
            flat[path] = node

    walk(params, ())
    return flat


def _unflatten(flat: Dict[Tuple[str, ...], Any]):
    out: Dict[str, Any] = {}
    for path, v in flat.items():
        node = out
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return out


_TORCH_LEAF_MAP = {
    "weight": ("kernel", "frozen_bn_weight", "scale"),
    "bias": ("bias", "frozen_bn_bias"),
    "running_mean": ("frozen_bn_mean",),
    "running_var": ("frozen_bn_var",),
    # STGeneralizedRCNN registers the BERT word-embedding table as a bare
    # Parameter named `bert.embeddings` (reference transformers.py:24);
    # our table-only backbone calls it word_embeddings.
    "embeddings": ("word_embeddings",),
}


def _normalize_torch_key(key: str) -> str:
    """Converts a torch dotted name into a slash path in our module
    vocabulary: layerN.M -> layerN/blockM, downsample.0/1 ->
    downsample_conv/bn, predictor/extractor names flattened, and the
    student-teacher module names mapped onto our subtrees
    (roi_heads -> teacher, roi_heads_student -> student) so a full ST
    checkpoint routes each bundle deterministically instead of tying on
    the shared suffix (the round-1 dual-population defect)."""
    parts = key.split(".")
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p.startswith("layer") and i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append(p)
            out.append(f"block{parts[i + 1]}")
            i += 2
            continue
        if p == "downsample" and i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append(
                "downsample_conv" if parts[i + 1] == "0" else "downsample_bn"
            )
            i += 2
            continue
        if p == "roi_heads_student":
            out.append("student")
            i += 1
            continue
        if p == "roi_heads":
            out.append("teacher")
            i += 1
            continue
        # roi_heads.{box,mask}.predictor -> {box,mask}_predictor;
        # roi_heads.{box,mask}.feature_extractor.head -> roi_extractor
        # (reference box_head/roi_box_feature_extractors.py:13-46 pooler
        # + ResNetHead; ours is the shared RoIHeadsBundle.roi_extractor)
        if p in ("box", "mask") and i + 1 < len(parts):
            if parts[i + 1] == "predictor":
                out.append(f"{p}_predictor")
                i += 2
                continue
            if (
                parts[i + 1] == "feature_extractor"
                and i + 2 < len(parts)
                and parts[i + 2] == "head"
            ):
                out.append("roi_extractor")
                i += 3
                continue
        out.append(p)
        i += 1
    return "/".join(out)


def _candidate_values(value: np.ndarray, target_shape) -> Optional[np.ndarray]:
    """Reshapes/transposes a torch tensor to the flax layout implied by
    the target shape, or None if incompatible."""
    v = np.asarray(value)
    if tuple(v.shape) == tuple(target_shape):
        return v
    if v.ndim == 4:
        # Conv2d: torch (out, in, kh, kw) -> flax (kh, kw, in, out).
        t = v.transpose(2, 3, 1, 0)
        if tuple(t.shape) == tuple(target_shape):
            return t
        # ConvTranspose2d: torch (in, out, kh, kw) -> flax ConvTranspose
        # (kh, kw, in, out) *with a spatial flip* — torch's deconv is the
        # gradient of conv (taps reversed), flax/lax.conv_transpose reads
        # the kernel unflipped (verified exact in
        # tests/test_checkpoint.py::test_conv_transpose_import).  Only
        # reached when in != out, so it cannot shadow a Conv2d kernel;
        # a *square* ConvTranspose would be ambiguous, and none exists
        # in this model family (conv5_mask 2048->256, kps deconv 512->K).
        t = v[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
        if tuple(t.shape) == tuple(target_shape):
            return t
    if v.ndim == 2 and tuple(v.T.shape) == tuple(target_shape):
        return v.T
    if v.ndim == 1 and tuple(v.shape) == tuple(target_shape):
        return v
    return None


def apply_reference_key_surgery(
    state_dict: Dict[str, np.ndarray],
    backbone_prefix: str = "",
    load_emb_pred_from_mmss_head: bool = False,
    default_mmss_head: str = "GroundingHead",
    load_classifier: bool = True,
) -> Dict[str, np.ndarray]:
    """The DetectronCheckpointer renames (checkpoint.py:113-126)."""
    out = {}
    for k, v in state_dict.items():
        nk = k
        if nk.startswith("module."):
            nk = nk[len("module.") :]
        if backbone_prefix and nk.startswith(backbone_prefix):
            nk = "backbone.body." + nk[len(backbone_prefix) :]
        if load_emb_pred_from_mmss_head:
            marker = f"mmss_heads.{default_mmss_head}.v2l_projection"
            if marker in nk:
                nk = "roi_heads.box.predictor.emb_pred" + nk[
                    nk.index(marker) + len(marker) :
                ]
        if not load_classifier and "cls_score" in nk:
            continue
        out[nk] = v
    return out


def import_torch_state_dict(
    params: Dict[str, Any],
    state_dict: Dict[str, np.ndarray],
    verbose: bool = False,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Longest-suffix matching of translated torch keys onto the flax
    param tree (model_serialization.py:10-67 semantics).

    Returns (new_params, report) where report lists matched/missed keys.
    """
    flat = _flatten_params(params)
    # target path strings (leaf translated back to torch-ish vocab)
    target_keys = {path: "/".join(path) for path in flat}
    top_level = {path[0] for path in flat if len(path) > 1}

    matched, missed = {}, []
    used_targets = set()
    for tk, tv in state_dict.items():
        tv = np.asarray(tv)
        norm = _normalize_torch_key(tk)
        segs = norm.split("/")
        leaf = segs[-1]
        body = segs[:-1]
        leaf_options = _TORCH_LEAF_MAP.get(leaf, (leaf,))
        # when the source names a known top-level subtree (teacher /
        # student / backbone ...), never let suffix matching cross into a
        # different subtree: an ST checkpoint's duplicated shared-
        # extractor keys (roi_heads.mask.feature_extractor == box's)
        # would otherwise fall through onto the *student's* extractor
        # before the student's own keys are reached
        root = body[0] if body and body[0] in top_level else None
        best = None
        best_len = -1
        for path, pstr in target_keys.items():
            if path in used_targets:
                continue
            if root is not None and path[0] != root:
                continue
            if path[-1] not in leaf_options:
                continue
            # suffix match on the body segments
            tpath = list(path[:-1])
            n = 0
            while (
                n < len(body)
                and n < len(tpath)
                and body[len(body) - 1 - n] == tpath[len(tpath) - 1 - n]
            ):
                n += 1
            if n == 0 and body:
                continue
            cand = _candidate_values(tv, flat[path].shape)
            if cand is None:
                continue
            if n > best_len:
                best_len = n
                best = (path, cand)
        if best is None:
            missed.append(tk)
            continue
        matched[best[0]] = best[1]
        used_targets.add(best[0])
        if verbose:
            print(f"{tk} -> {'/'.join(best[0])}")

    new_flat = dict(flat)
    for path, v in matched.items():
        new_flat[path] = np.asarray(v, dtype=np.asarray(flat[path]).dtype)
    report = {
        "matched": len(matched),
        "missed_source_keys": missed,
        "unfilled_targets": [
            "/".join(p) for p in flat if p not in matched
        ],
    }
    return _unflatten(new_flat), report


def extract_params_tree(raw) -> Dict[str, Any]:
    """Pulls the bare model param tree out of a raw orbax restore.

    Saved training states nest as ``{"state": TrainState, "iteration"}``
    with ``TrainState.params = {"params": <tree>}`` (plus collections);
    eval-side dumps may already be ``{"params": <tree>}``.  Model trees
    never contain a top-level ``params`` key themselves (their keys are
    module names), so unwrapping is unambiguous."""
    node = raw
    if isinstance(node, dict) and "state" in node:
        node = node["state"]
    for _ in range(2):
        if (
            isinstance(node, dict)
            and "params" in node
            and isinstance(node["params"], dict)
        ):
            node = node["params"]
    return node


def import_flax_params(
    params: Dict[str, Any],
    source_params: Dict[str, Any],
    load_emb_pred_from_mmss_head: bool = False,
    default_mmss_head: str = "GroundingHead",
    load_classifier: bool = True,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Cross-stage import between this framework's OWN checkpoints: the
    documented pipeline trains MMSS -> teacher -> student entirely here,
    so stage N+1's MODEL.WEIGHT is an orbax directory, not a torch .pth.
    Transplants the reference DetectronCheckpointer surgeries
    (checkpoint.py:113-126) into the flax naming vocabulary:

    * identical paths with identical shapes copy directly (both sides
      share this framework's module names — no layout transposes);
    * MMSS ``v2l_projection`` (shared or ``v2l_projection_<HEAD>``) ->
      the box predictor's ``emb_pred`` when
      LOAD_EMB_PRED_FROM_MMSS_HEAD (reference checkpoint.py:120-122);
    * an MMSS C5 backbone's ``backbone/body/layer4`` -> the C4 RoI
      extractor's ``layer4`` (the reference reaches the same routing
      via suffix matching, model_serialization.py:10-67);
    * a GeneralizedRCNN source routes ``roi_extractor`` /
      ``*_predictor`` onto the ST ``teacher`` bundle (the student is
      then populated by prepare_model, st_generalized_rcnn.py:197-199);
    * an MMSS ``language_backbone`` fills the ST ``bert`` table;
    * classifier leaves skipped unless ``load_classifier``
      (checkpoint.py:125-126).

    Returns (new_params, report) with the torch importer's report shape.
    """
    tflat = _flatten_params(params)
    sflat = _flatten_params(source_params)
    t_tops = {p[0] for p in tflat if len(p) > 1}

    def emb_pred_base(bundle: str = "teacher") -> Optional[Tuple[str, ...]]:
        for cand in (
            ("box_predictor", "emb_pred"),
            (bundle, "box_predictor", "emb_pred"),
        ):
            if any(p[: len(cand)] == cand for p in tflat):
                return cand
        return None

    matched, missed = {}, []
    for spath, sval in sflat.items():
        # source-path surgeries, most specific first
        candidates = []
        if load_emb_pred_from_mmss_head and spath[0] in (
            "v2l_projection",
            f"v2l_projection_{default_mmss_head}",
        ):
            base = emb_pred_base()
            if base is not None:
                candidates.append(base + spath[1:])
        if spath[:3] == ("backbone", "body", "layer4"):
            # C5 pretraining backbone -> C4 detector's RoI extractor
            for root in (("roi_extractor",), ("teacher", "roi_extractor")):
                candidates.append(root + spath[2:])
        if spath[0] == "language_backbone" and "bert" in t_tops:
            candidates.append(("bert",) + spath[1:])
        if spath[0] == "bert" and "language_backbone" in t_tops:
            candidates.append(("language_backbone",) + spath[1:])
        if spath[0] in (
            "roi_extractor",
            "box_predictor",
            "mask_predictor",
            "keypoint_predictor",
        ) and "teacher" in t_tops and spath[0] not in t_tops:
            candidates.append(("teacher",) + spath)
        candidates.append(spath)  # identity last

        if not load_classifier and "cls_score" in spath:
            continue
        placed = False
        for tpath in candidates:
            tgt = tflat.get(tpath)
            if tgt is not None and tuple(np.shape(tgt)) == tuple(
                np.shape(sval)
            ):
                matched[tpath] = np.asarray(
                    sval, dtype=np.asarray(tgt).dtype
                )
                placed = True
                break
        if not placed:
            missed.append("/".join(spath))

    new_flat = dict(tflat)
    new_flat.update(matched)
    report = {
        "matched": len(matched),
        "missed_source_keys": missed,
        "unfilled_targets": [
            "/".join(p) for p in tflat if p not in matched
        ],
    }
    return _unflatten(new_flat), report


def import_language_table(
    params: Dict[str, Any], weight_path: str
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Fills the (frozen) language backbone — the BERT word-embedding
    table and, for full-encoder models, the encoder — from another
    checkpoint (``MODEL.LANGUAGE_WEIGHT``).

    Needed to close the all-native pipeline: a stage-2 teacher orbax
    checkpoint carries no BERT (GeneralizedRCNN has none), so a stage-3
    ST run started from it would leave the class-name embedding table
    at random init.  The table lives in the stage-1 MMSS checkpoint
    (``language_backbone``) or in any reference ``.pth`` that registers
    ``bert.embeddings``.  The reference instead re-downloads pretrained
    ``bert-base-uncased`` at construction (transformers.py:16-24) —
    not an option for an offline training host."""
    if os.path.isdir(weight_path):
        ckpt_dir = latest_checkpoint(weight_path) or weight_path
        src = extract_params_tree(load_checkpoint(ckpt_dir))
        sflat = _flatten_params(src)
        keep = {
            p: v
            for p, v in sflat.items()
            if p and p[0] in ("bert", "language_backbone")
        }
        return import_flax_params(params, _unflatten(keep))
    sd = load_torch_checkpoint(weight_path)
    sd = {
        k: v
        for k, v in sd.items()
        if "bert" in k or "language_backbone" in k
    }
    return import_torch_state_dict(params, sd)


def populate_student_from_teacher(
    params: Dict[str, Any],
    teacher_key: str = "teacher",
    student_key: str = "student",
) -> Tuple[Dict[str, Any], int]:
    """prepare_model step 3 (reference st_generalized_rcnn.py:197-199):
    at iteration 0, unless ``MODEL.RESUME``, the student roi_heads are
    initialized as a copy of the (frozen) teacher roi_heads
    (``load_state_dict(teacher.state_dict(), strict=False)``).

    Copies every ``teacher/...`` leaf onto the same relative path under
    ``student/...`` when it exists with the same shape; student-only
    leaves (e.g. the uncertainty head's ``uncertain_pred``) are left at
    their fresh initialization, matching ``strict=False``.

    Returns (new_params, number_of_leaves_copied)."""
    flat = _flatten_params(params)
    out = dict(flat)
    copied = 0
    for path, v in flat.items():
        if not path or path[0] != teacher_key:
            continue
        spath = (student_key,) + path[1:]
        tgt = flat.get(spath)
        if tgt is not None and tuple(np.shape(tgt)) == tuple(np.shape(v)):
            # materialize a distinct buffer: aliasing the teacher leaf
            # makes a donating jitted train step fail with "attempt to
            # donate the same buffer twice"
            out[spath] = np.array(v)
            copied += 1
    return _unflatten(out), copied


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Loads a torch .pth (or Caffe2-converted dict) to numpy."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "model" in blob:
        blob = blob["model"]
    return {
        k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
        for k, v in blob.items()
    }


def import_external_weights(params_tree, weight_path: str, cfg):
    """The MODEL.WEIGHT import chain, shared by both CLIs
    (tools/train_net.py, tools/test_net.py — reference
    utils/checkpoint.py:51-75 _load_file dispatch):

    * an orbax checkpoint dir (or an OUTPUT_DIR whose last_checkpoint
      tag names one) — cross-stage import in this framework's own
      vocabulary via :func:`import_flax_params`;
    * a Caffe2 ``.pkl`` — ImageNet init blobs;
    * a torch ``.pth``/state-dict file — reference weights through
      :func:`apply_reference_key_surgery` + :func:`import_torch_state_dict`.

    Returns ``(new_params_tree, message)``; ``message`` is None when
    ``weight_path`` names no importable source (params unchanged).
    """
    import jax
    import jax.numpy as jnp

    surgery = dict(
        load_emb_pred_from_mmss_head=cfg.MODEL.LOAD_EMB_PRED_FROM_MMSS_HEAD,
        default_mmss_head=cfg.MODEL.MMSS_HEAD.DEFAULT_HEAD,
        load_classifier=cfg.MODEL.LOAD_CLASSIFIER,
    )
    if weight_path and os.path.isdir(weight_path):
        ckpt_dir = latest_checkpoint(weight_path) or weight_path
        src = extract_params_tree(load_checkpoint(ckpt_dir))
        new_params, report = import_flax_params(params_tree, src, **surgery)
        msg = (
            f"imported {report['matched']} leaves from orbax checkpoint "
            f"{ckpt_dir} ({len(report['missed_source_keys'])} source "
            "leaves unmatched)"
        )
    elif weight_path and weight_path.endswith(".pkl") and os.path.exists(
        weight_path
    ):
        from .c2_loading import import_c2_imagenet_weights

        new_params, report = import_c2_imagenet_weights(
            params_tree, weight_path
        )
        msg = f"imported {report['matched']} caffe2 blobs"
    elif weight_path and os.path.exists(weight_path):
        sd = load_torch_checkpoint(weight_path)
        sd = apply_reference_key_surgery(
            sd, backbone_prefix=cfg.MODEL.BACKBONE_PREFIX, **surgery
        )
        new_params, report = import_torch_state_dict(params_tree, sd)
        msg = (
            f"imported {report['matched']} torch tensors "
            f"({len(report['missed_source_keys'])} source keys unmatched)"
        )
    else:
        return params_tree, None
    return jax.tree_util.tree_map(jnp.asarray, new_params), msg
