"""Environment reporting + misc helpers.

Re-designs of reference utils/collect_env.py (collect_env_info dumped at
startup, train_net.py:209-210) and utils/miscellaneous.py (mkdir,
save_labels)."""

import json
import os
import platform
import sys
from typing import Dict


def collect_env_info() -> str:
    import jax

    lines = [
        f"python: {sys.version.split()[0]} ({platform.platform()})",
        f"jax: {jax.__version__}",
        f"backend: {jax.default_backend()}",
        f"devices: {[str(d) for d in jax.devices()]}",
        f"process: {jax.process_index()}/{jax.process_count()}",
    ]
    try:
        import flax
        import optax

        lines.append(f"flax: {flax.__version__}  optax: {optax.__version__}")
    except Exception:
        pass
    try:
        import numpy as np

        lines.append(f"numpy: {np.__version__}")
    except Exception:
        pass
    from .native import get_lib

    lines.append(f"native maskops: {'loaded' if get_lib() else 'unavailable'}")
    return "\n".join(lines)


def mkdir(path: str):
    os.makedirs(path, exist_ok=True)


def save_labels(class_names, output_dir: str):
    """Dumps the category mapping (miscellaneous.py:17 save_labels)."""
    mkdir(output_dir)
    with open(os.path.join(output_dir, "labels.json"), "w") as f:
        json.dump(
            {i: n for i, n in enumerate(class_names)}, f, indent=2
        )
