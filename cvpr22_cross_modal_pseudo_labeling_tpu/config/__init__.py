from .cfg_node import CfgNode
from .defaults import get_default_cfg

# Module-level default config instance, mirroring the reference's
# ``from maskrcnn_benchmark.config import cfg`` usage pattern
# (reference: maskrcnn_benchmark/config/__init__.py).
cfg = get_default_cfg()

__all__ = ["CfgNode", "cfg", "get_default_cfg"]
