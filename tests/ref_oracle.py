"""Import helpers for using the reference implementation as a parity
oracle.

The reference at /root/reference is PyTorch-1.4-era code whose CUDA
extension (maskrcnn_benchmark._C), apex, yacs, pycocotools and old
transformers API are unavailable here.  This module installs minimal
stand-ins into sys.modules so the *pure-torch math* modules — BoxCoder,
Matcher, boxlist ops, anchor generator, RPN/box-head postprocessors,
ResNet with FrozenBatchNorm, the Masker, the loss computations — import
and run on CPU torch.  Those modules then serve as golden oracles for
our JAX implementations (VERDICT r1 item 1: module-level forward-parity
evidence against the reference).

Only _C.nms is given real behavior (a sequential greedy python loop —
the exact csrc/cpu/nms_cpu.cpp algorithm, independently re-derived and
cross-checked in tests/test_nms.py); everything else raises if touched.
"""

import importlib.machinery
import sys
import types

import numpy as np

REF_ROOT = "/root/reference"


def _module(name: str) -> types.ModuleType:
    """A stub module with a valid __spec__ (importlib.util.find_spec on
    an already-imported module reads it; None breaks e.g. transformers'
    dependency probing)."""
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod


def _greedy_nms_torch(dets, scores, threshold):
    """csrc/cpu/nms_cpu.cpp semantics: sort by score, keep greedily,
    suppress IoU > threshold with the legacy +1 areas.  Returns kept
    indices (int64 tensor) in score order."""
    import torch

    boxes = dets.detach().cpu().numpy().astype(np.float64)
    s = scores.detach().cpu().numpy()
    order = np.argsort(-s, kind="stable")
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    suppressed = np.zeros(len(boxes), bool)
    keep = []
    for i in order:
        if suppressed[i]:
            continue
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1)
        yy1 = np.maximum(y1[i], y1)
        xx2 = np.minimum(x2[i], x2)
        yy2 = np.minimum(y2[i], y2)
        w = np.clip(xx2 - xx1 + 1, 0, None)
        h = np.clip(yy2 - yy1 + 1, 0, None)
        inter = w * h
        iou = inter / (areas[i] + areas - inter)
        suppressed |= iou > threshold
        suppressed[i] = True
    return torch.as_tensor(keep, dtype=torch.int64)


class _StubAttr:
    def __init__(self, name):
        self._name = name

    def __call__(self, *a, **k):
        raise RuntimeError(f"stubbed reference native op called: {self._name}")


class _CfgNode(dict):
    """Tiny yacs.config.CfgNode stand-in: attribute-style nested dict
    with the handful of methods reference import-time code touches."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    def clone(self):
        import copy

        return copy.deepcopy(self)

    def merge_from_file(self, *a, **k):
        raise NotImplementedError

    def merge_from_list(self, *a, **k):
        raise NotImplementedError

    def freeze(self):
        pass

    def defrost(self):
        pass

    @staticmethod
    def load_cfg(*a, **k):
        raise NotImplementedError


def install_reference(with_transformers_shim: bool = False):
    """Puts /root/reference on sys.path with the stub modules installed.
    Idempotent.  Returns the maskrcnn_benchmark package."""
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)

    # numpy 1.x scalar aliases the 2020-era reference still uses
    for alias, typ in (
        ("float", float),
        ("int", int),
        ("bool", bool),
        ("object", object),
        ("long", int),
    ):
        if not hasattr(np, alias):
            setattr(np, alias, typ)

    # --- apex.amp: identity decorators --------------------------------
    if "apex" not in sys.modules:
        apex = _module("apex")
        amp = _module("apex.amp")
        amp.float_function = lambda fn: fn
        amp.half_function = lambda fn: fn
        amp.promote_function = lambda fn: fn

        class _AmpState:  # pragma: no cover - never exercised
            loss_scalers = []

        amp.state = _AmpState()
        apex.amp = amp
        sys.modules["apex"] = apex
        sys.modules["apex.amp"] = amp

    # --- maskrcnn_benchmark._C -----------------------------------------
    if "maskrcnn_benchmark._C" not in sys.modules:
        c = _module("maskrcnn_benchmark._C")
        c.nms = _greedy_nms_torch
        for fn in (
            "roi_align_forward",
            "roi_align_backward",
            "roi_pool_forward",
            "roi_pool_backward",
            "sigmoid_focalloss_forward",
            "sigmoid_focalloss_backward",
            "deform_conv_forward",
            "deform_conv_backward_input",
            "deform_conv_backward_parameters",
            "modulated_deform_conv_forward",
            "modulated_deform_conv_backward",
            "deform_psroi_pooling_forward",
            "deform_psroi_pooling_backward",
        ):
            setattr(c, fn, _StubAttr(fn))
        sys.modules["maskrcnn_benchmark._C"] = c

    # --- yacs ----------------------------------------------------------
    if "yacs" not in sys.modules:
        yacs = _module("yacs")
        yacs_config = _module("yacs.config")
        yacs_config.CfgNode = _CfgNode
        yacs.config = yacs_config
        sys.modules["yacs"] = yacs
        sys.modules["yacs.config"] = yacs_config

    # --- pycocotools (only needed at segmentation_mask import time) ----
    if "pycocotools" not in sys.modules:
        pyc = _module("pycocotools")
        pyc_mask = _module("pycocotools.mask")
        for fn in ("frPyObjects", "decode", "encode", "merge", "iou", "area"):
            setattr(pyc_mask, fn, _StubAttr(f"pycocotools.mask.{fn}"))
        pyc.mask = pyc_mask
        pyc_coco = _module("pycocotools.coco")
        pyc_coco.COCO = _StubAttr("pycocotools.coco.COCO")
        pyc.coco = pyc_coco
        sys.modules["pycocotools"] = pyc
        sys.modules["pycocotools.mask"] = pyc_mask
        sys.modules["pycocotools.coco"] = pyc_coco

    # --- transformers.modeling_bert (pre-3.x HF layout) -----------------
    if with_transformers_shim and "transformers.modeling_bert" not in sys.modules:
        import torch
        import transformers
        from transformers.models.bert import modeling_bert as new_bert

        shim = _module("transformers.modeling_bert")
        for name in (
            "BertEncoder",
            "BertPooler",
            "BertLMPredictionHead",
            "BertPredictionHeadTransform",
            "BertModel",
        ):
            if hasattr(new_bert, name):
                setattr(shim, name, getattr(new_bert, name))
        shim.BertLayerNorm = torch.nn.LayerNorm
        sys.modules["transformers.modeling_bert"] = shim

    # CPU-only torch: make .cuda() / .to('cuda') no-ops (the reference
    # hardcodes them in loss paths, e.g. box_head/loss.py:173,
    # grounding_head.py:327-339)
    import torch

    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self
        torch.nn.Module.cuda = lambda self, *a, **k: self
        if not getattr(torch.Tensor, "_cmpl_to_patched", False):
            _orig_to = torch.Tensor.to

            def _to(self, *args, **kwargs):
                if args and (
                    args[0] == "cuda"
                    or (
                        isinstance(args[0], torch.device)
                        and args[0].type == "cuda"
                    )
                ):
                    args = ("cpu",) + args[1:]
                if kwargs.get("device") in ("cuda", torch.device("cuda")):
                    kwargs["device"] = "cpu"
                return _orig_to(self, *args, **kwargs)

            torch.Tensor.to = _to
            torch.Tensor._cmpl_to_patched = True

    import maskrcnn_benchmark  # noqa: F401

    return sys.modules["maskrcnn_benchmark"]


def ref_module(name: str, with_transformers_shim: bool = False):
    """install_reference() + import a maskrcnn_benchmark submodule."""
    install_reference(with_transformers_shim=with_transformers_shim)
    import importlib

    return importlib.import_module(f"maskrcnn_benchmark.{name}")


def install_reference_full():
    """install_reference() plus everything `build_detection_model` needs
    to construct and run the COMPLETE reference model on CPU:

    - the reference's own compiled CPU kernels (csrc/cpu/{nms,ROIAlign})
      wired into the _C stub (see tests/ref_native.py),
    - torch._six / torchvision / spacy / nltk import shims
      (import-time-only dependencies of the data package, which
      st_generalized_rcnn.py:18 pulls in transitively),
    - the `build_language_backbone` entry point that is missing at
      reference HEAD (SURVEY §2.10 defect 1) so detectors.py imports.

    Returns the reference `build_detection_model`.
    """
    import torch

    # torch._six was removed in torch>=1.9
    if "torch._six" not in sys.modules:
        import collections.abc

        six = _module("torch._six")
        six.PY3 = True
        six.string_classes = (str,)
        six.int_classes = (int,)
        six.container_abcs = collections.abc
        sys.modules["torch._six"] = six
        torch._six = six

    # torchvision: only CocoDetection/CocoCaptions base classes and the
    # exact-version assert (openimages.py:54) are touched at import time
    if "torchvision" not in sys.modules:
        tv = _module("torchvision")
        tv.__version__ = "0.8.2+cu110"
        tv_datasets = _module("torchvision.datasets")
        tv_coco = _module("torchvision.datasets.coco")

        class _TVCocoDetection:
            def __init__(self, *a, **k):
                raise RuntimeError("torchvision stub dataset instantiated")

        class _TVCocoCaptions(_TVCocoDetection):
            pass

        tv_coco.CocoDetection = _TVCocoDetection
        tv_coco.CocoCaptions = _TVCocoCaptions
        tv_datasets.coco = tv_coco
        tv_datasets.CocoDetection = _TVCocoDetection
        tv_datasets.CocoCaptions = _TVCocoCaptions
        tv.datasets = tv_datasets
        tv_transforms = _module("torchvision.transforms")
        tv_functional = _module("torchvision.transforms.functional")
        for fn in ("to_tensor", "normalize", "hflip", "vflip", "resize"):
            setattr(tv_functional, fn, _StubAttr(f"torchvision.F.{fn}"))
        tv_transforms.functional = tv_functional
        tv_transforms.ColorJitter = _StubAttr("torchvision.ColorJitter")
        tv.transforms = tv_transforms
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.datasets"] = tv_datasets
        sys.modules["torchvision.datasets.coco"] = tv_coco
        sys.modules["torchvision.transforms"] = tv_transforms
        sys.modules["torchvision.transforms.functional"] = tv_functional

    # spacy / nltk (LVISParser imports; only instantiated lazily)
    if "spacy" not in sys.modules:
        spacy = _module("spacy")
        spacy.load = _StubAttr("spacy.load")
        sys.modules["spacy"] = spacy
    if "nltk" not in sys.modules:
        nltk = _module("nltk")
        corpus = _module("nltk.corpus")
        corpus.wordnet = _module("nltk.corpus.wordnet")
        corpus.wordnet.synsets = _StubAttr("wordnet.synsets")
        nltk.corpus = corpus
        sys.modules["nltk"] = nltk
        sys.modules["nltk.corpus"] = corpus
    if "pycococreatortools" not in sys.modules:
        pcc = _module("pycococreatortools")
        pcc_inner = _module("pycococreatortools.pycococreatortools")
        pcc_inner.create_annotation_info = _StubAttr(
            "pycococreatortools.create_annotation_info"
        )
        pcc.pycococreatortools = pcc_inner
        sys.modules["pycococreatortools"] = pcc
        sys.modules["pycococreatortools.pycococreatortools"] = pcc_inner
    if "cityscapesscripts" not in sys.modules:
        cs = _module("cityscapesscripts")
        helpers = _module("cityscapesscripts.helpers")
        helpers.csHelpers = _module("cityscapesscripts.helpers.csHelpers")
        cs.helpers = helpers
        sys.modules["cityscapesscripts"] = cs
        sys.modules["cityscapesscripts.helpers"] = helpers
        sys.modules["cityscapesscripts.helpers.csHelpers"] = helpers.csHelpers

    install_reference(with_transformers_shim=True)

    # real kernels for the CPU-capable native ops
    from ref_native import load_reference_cpu_ops

    ops = load_reference_cpu_ops()
    c = sys.modules["maskrcnn_benchmark._C"]
    c.nms = ops.nms_cpu
    c.roi_align_forward = ops.roi_align_forward_cpu

    import maskrcnn_benchmark.modeling.language_backbone as lb

    if not hasattr(lb, "build_language_backbone"):
        # GeneralizedRCNN never calls it; present only so detectors.py
        # (which imports mmss_gcnn unconditionally) can be imported.
        def _no_lb(cfg):
            raise RuntimeError("language backbone not wired in this oracle")

        lb.build_language_backbone = _no_lb

    from maskrcnn_benchmark.modeling.detector import build_detection_model

    return build_detection_model
