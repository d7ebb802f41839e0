"""Tensor-parallel model execution via shard_map (component A4).

The Pallas kernel tier is opaque to GSPMD auto-partitioning, so the product
path for multi-chip is explicit SPMD: the whole decode/prefill step runs
inside one shard_map over the (data, model) mesh; every device executes its
local Pallas qmatmuls on its weight shard and the collectives (psum after
row-parallel layers, all_gather of vocab-sharded logits) are placed by the
model itself (QLinear.psum_axis / LlamaModel.tp_axis). XLA's latency-hiding
scheduler overlaps those collectives with the surrounding int8 matmuls
(SURVEY.md §5.8; `async_collectives` flags in utils/profiling.py).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
from jax.sharding import PartitionSpec as P

try:  # jax >= 0.6 moved shard_map to jax.*
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from ..models.llama import LlamaModel, init_cache
from ..utils.config import ModelConfig
from .mesh import DATA_AXIS, MODEL_AXIS
from .shardings import cache_pspecs, params_pspecs


def tp_model(cfg: ModelConfig, mode: str, mesh, dtype=None, sp: bool = False,
             int4_group: int = 128, collective: bool = False,
             lora_rank: int = 0, lora_alpha: float = 16.0,
             lora_targets: tuple = ("q_proj", "k_proj", "v_proj", "o_proj"),
             lora_stack: int = 0,
             ) -> LlamaModel:
    """The TP-aware model for a mesh: head/feature dims divided by tp.
    ``sp`` additionally token-shards the norm/elementwise regions between TP
    blocks (sequence parallelism; prefill/scoring path). ``collective``
    routes the row-parallel reductions through the overlapped ring
    collective matmul (parallel/collective.py) instead of bare psum.
    ``lora_rank`` > 0 serves LoRA adapters over the quantized base
    (shardings.py routes lora_a/lora_b per parallelism style)."""
    import jax.numpy as jnp

    tp = mesh.shape[MODEL_AXIS]
    return LlamaModel(
        cfg, mode=mode, dtype=dtype or jnp.bfloat16, tp=tp, tp_axis=MODEL_AXIS,
        sp=sp, int4_group=int4_group, collective=collective,
        lora_rank=lora_rank, lora_alpha=lora_alpha, lora_targets=lora_targets,
        lora_stack=lora_stack,
    )


def build_tp_step(model: LlamaModel, mesh, params_tree, caches_tree):
    """Returns jitted fn(params, tokens, positions, caches, advance) ->
    (logits, caches), running SPMD over the mesh.

    params_tree/caches_tree are *global* pytrees (only their structure and
    specs are used here); pass the same trees (device_put via
    shardings.shard_params) at call time.
    """
    pspecs = params_pspecs(params_tree)
    cspecs = cache_pspecs(caches_tree)
    tok_spec = P(DATA_AXIS, None)

    @partial(
        _shard_map,
        mesh=mesh,
        in_specs=(pspecs, tok_spec, tok_spec, cspecs, P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS, None, None), cspecs),
        check_vma=False,
    )
    def fwd(params, tokens, positions, caches, advance):
        return model.apply(params, tokens, positions, caches, advance=advance)

    return jax.jit(fwd, donate_argnums=(3,))


def build_tp_score(model: LlamaModel, mesh, params_tree):
    """Cache-free scoring/prefill-style forward: fn(params, tokens) -> logits."""
    pspecs = params_pspecs(params_tree)

    @partial(
        _shard_map,
        mesh=mesh,
        in_specs=(pspecs, P(DATA_AXIS, None)),
        out_specs=P(DATA_AXIS, None, None),
        check_vma=False,
    )
    def fwd(params, tokens):
        return model.apply(params, tokens)

    return jax.jit(fwd)


def make_tp_caches(
    cfg: ModelConfig, mesh, batch: int, max_seq: int, kv_dtype
) -> Any:
    """Global-shape caches for a TP step (shard_map splits kv-head axis)."""
    return init_cache(cfg, batch, max_seq, kv_dtype=kv_dtype, tp=1)


def build_cp_score(cfg: ModelConfig, mode: str, mesh, seq_axis: str = "seq",
                   dtype=None):
    """Context-parallel cache-free scoring: tokens seq-sharded over
    ``seq_axis``, weights replicated, ring attention inside each layer
    (models use cp/cp_axis). Returns jitted fn(params, tokens) -> logits
    with tokens/logits seq-sharded global arrays.
    """
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    cp = mesh.shape[seq_axis]
    model = LlamaModel(
        cfg, mode=mode, dtype=dtype or jnp.bfloat16, cp=cp, cp_axis=seq_axis
    )

    @partial(
        _shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, seq_axis)),
        out_specs=P(None, seq_axis),
        check_vma=False,
    )
    def fwd(params, tokens_shard):
        B, T_l = tokens_shard.shape
        r = jax.lax.axis_index(seq_axis)
        positions = r * T_l + jnp.broadcast_to(jnp.arange(T_l)[None], (B, T_l))
        return model.apply(params, tokens_shard, positions)

    return jax.jit(fwd)
