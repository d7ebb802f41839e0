"""Checkpoint / resume via orbax (SURVEY.md §5.4).

QTensor pytrees (int8 payload + f32 scales) save/restore like any other
params tree; shardings are honored on restore when a target tree with
sharded abstract leaves is provided (multi-host aware via orbax's
multiprocess IO).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax


def save_checkpoint(path: str, params: Any, config_json: str | None = None):
    """Write params (possibly containing QTensor leaves) to ``path``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params)
    ckptr.wait_until_finished()
    if config_json is not None:
        with open(os.path.join(path, "protoquant_config.json"), "w") as f:
            f.write(config_json)


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore into the structure (and shardings) of ``target``.

    ``target`` may be a concrete example tree (e.g. freshly-initialized
    params) or a tree of jax.ShapeDtypeStruct with shardings attached.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
    return ckptr.restore(path, abstract)


def load_config(path: str) -> dict | None:
    p = os.path.join(os.path.abspath(path), "protoquant_config.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None
