"""Dataset registry (reference data/datasets/__init__.py:3-14 — with the
missing-comma __all__ bug fixed, SURVEY.md 2.10 item 4)."""

from .coco import COCODataset
from .voc import PascalVOCDataset
from .coco_cap_det import COCOCapDetDataset
from .coco_captions import COCOCaptionsDataset
from .concat import ConcatDataset
from .cityscapes import CityScapesDataset
from .conceptual import ConCapDetDataset, ConceptualOpenImagesDetDataset
from .list_dataset import ConceptualCaptionsDataset, ListDataset
from .openimages import OpenImagesDataset

__all__ = [
    "COCODataset",
    "COCOCapDetDataset",
    "COCOCaptionsDataset",
    "ConcatDataset",
    "ConCapDetDataset",
    "ConceptualOpenImagesDetDataset",
    "OpenImagesDataset",
    "PascalVOCDataset",
    "CityScapesDataset",
    "ListDataset",
    "ConceptualCaptionsDataset",
]
