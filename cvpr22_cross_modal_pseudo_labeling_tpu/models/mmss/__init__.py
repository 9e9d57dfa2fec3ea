from .grounding_head import GroundingHead, GroundingStatics
from .transformer_head import TransformerHead, TransformerHeadStatics
