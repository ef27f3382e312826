"""Model size estimation — the reference's ``modelsize()`` util (anomaly_detection_mgfn/
utils/utils.py:61-91, uncalled there) as a working flax-tree inspector."""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def param_count(variables: Any) -> int:
    params = variables.get("params", variables) if isinstance(variables, dict) else variables
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params) if hasattr(x, "shape")))


def tree_bytes(tree: Any) -> int:
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "shape"):
            total += int(np.prod(leaf.shape)) * np.dtype(leaf.dtype).itemsize
    return total


def model_size_report(variables: Any, name: str = "model") -> str:
    """Human-readable parameter/state summary (params + batch_stats, MB)."""
    n = param_count(variables)
    pb = tree_bytes(variables.get("params", {})) if isinstance(variables, dict) else tree_bytes(variables)
    sb = tree_bytes({k: v for k, v in variables.items() if k != "params"}) if isinstance(variables, dict) else 0
    return (
        f"{name}: {n / 1e6:.2f}M params, {pb / 1e6:.1f} MB params, "
        f"{sb / 1e6:.1f} MB non-param state"
    )
