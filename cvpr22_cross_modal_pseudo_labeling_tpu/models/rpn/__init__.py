from .anchors import (
    anchor_visibility,
    build_anchors_for_levels,
    generate_cell_anchors,
    grid_anchors,
)
from .rpn import (
    RPNHead,
    RPNProposals,
    flatten_rpn_outputs,
    rpn_loss,
    select_proposals_single_level,
)
