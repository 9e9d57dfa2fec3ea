from .checkpoint import (
    apply_reference_key_surgery,
    import_torch_state_dict,
    latest_checkpoint,
    load_checkpoint,
    load_torch_checkpoint,
    save_checkpoint,
)
from .inference import compute_on_dataset, inference
from .lr_schedule import warmup_multistep_schedule
from .optimizer import frozen_prefixes_from_cfg, make_optimizer
from .train_step import (
    TrainState,
    build_train_step,
    create_train_state,
    jit_train_step,
)
from .trainer import do_train
