from .mesh import DATA_AXIS, MODEL_AXIS, init_multihost, make_mesh
from .shardings import cache_pspecs, params_pspecs, shard_params
from .pipeline import build_pp_score, stack_layer_params
from .tp import build_cp_score, build_tp_score, build_tp_step, make_tp_caches, tp_model

__all__ = [
    "make_mesh",
    "init_multihost",
    "DATA_AXIS",
    "MODEL_AXIS",
    "params_pspecs",
    "cache_pspecs",
    "shard_params",
    "tp_model",
    "build_tp_step",
    "build_tp_score",
    "build_cp_score",
    "build_pp_score",
    "stack_layer_params",
    "make_tp_caches",
]
