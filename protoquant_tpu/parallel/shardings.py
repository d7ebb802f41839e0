"""Partition specs for quantized params and KV caches (SURVEY.md §2.2, §5.8).

Megatron-style TP over the ``model`` axis:
  * column-parallel (q/k/v/gate/up/lm_head): int8 payload sharded on its
    output-channel axis, per-channel scale vector sharded identically (it IS
    the output-channel axis — "scales shard with their channel");
  * row-parallel (o_proj/down_proj): payload sharded on the contraction axis,
    per-output-channel scales replicated (tiny: N x 4 bytes);
  * norms/embedding: replicated; KV caches: kv-head axis over ``model``,
    batch over ``data``.

These specs serve double duty: as shard_map in_specs/out_specs (the product
path — Pallas kernels run per shard with explicit psum), and as
NamedSharding for device_put when laying out params.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..engine.paged_kv import PagedInt8KVCache
from ..models.kv_cache import BF16KVCache, Int8KVCache
from .mesh import DATA_AXIS, MODEL_AXIS

COLUMN_PARALLEL = (
    "q_proj", "k_proj", "v_proj", "gate_proj", "up_proj", "lm_head",
    # MLA (models/mla.py): the head-expanding projections shard over heads;
    # q_a_proj / kv_a_proj_with_mqa emit per-token head-SHARED latents and
    # fall through to replicated (their outputs are tiny).
    "q_b_proj", "kv_b_proj",
)
ROW_PARALLEL = ("o_proj", "down_proj")


def _path_names(path) -> list[str]:
    names = []
    for e in path:
        if hasattr(e, "key"):
            names.append(str(e.key))
        elif hasattr(e, "name"):
            names.append(str(e.name))
        else:
            names.append(str(e))
    return names


MOE_EXPERT_WEIGHTS = ("w1", "w2", "w3")


def _param_spec(path, leaf) -> P:
    names = _path_names(path)
    joined = "/".join(names)
    is_scale = names and names[-1] == "scale"
    is_bias = names and names[-1] == "bias"
    ndim = getattr(leaf, "ndim", None)
    if any(n in MOE_EXPERT_WEIGHTS for n in names):
        # Expert parallelism: stacked expert tensors shard on the expert
        # (leading) axis over the model axis — kernel/qkernel.data [E, K, N]
        # and per-expert scales [E, N] alike. The router ("gate") falls
        # through to replicated.
        return P(MODEL_AXIS, *([None] * ((ndim or 1) - 1)))
    if (
        "block_sparse_moe" in names
        and "shared_experts" not in names
        and any(
            n in ("gate_up_proj", "down_proj", "gate_up_proj_bias",
                  "down_proj_bias")
            for n in names
        )
    ):
        # GPT-OSS stacked experts (+ per-expert biases): expert axis over
        # the model axis. shared_experts are dense QLinears and fall through
        # to the column/row-parallel rules below.
        return P(MODEL_AXIS, *([None] * ((ndim or 1) - 1)))
    if names and names[-1] == "sinks":
        # GPT-OSS learned attention sinks: one logit per head, sharded with
        # the heads under TP.
        return P(MODEL_AXIS)
    if names and names[-1] == "act_scale":
        # W8A8-static per-tensor activation scale: a scalar, replicated
        # (row-parallel shards quantize their K-slice with the same scale —
        # exact, the epilogue is linear and rides the psum).
        return P()
    is_lora_a = names and names[-1] == "lora_a"
    is_lora_b = names and names[-1] == "lora_b"
    if any(f"/{p}/" in f"/{joined}/" for p in COLUMN_PARALLEL):
        if is_scale:
            if ndim == 2:  # int4 group-wise scale [K/group, N]: shard N
                return P(None, MODEL_AXIS)
            return P(MODEL_AXIS)  # per-output-channel scale shards with N
        if is_bias:
            return P(MODEL_AXIS)  # bias follows the sharded output features
        if is_lora_a:
            return P()  # [(n,) K, r]: K unsharded for column-parallel
        if is_lora_b:
            # [r, N] / stacked [n, r, N]: shard the output features.
            return (P(None, None, MODEL_AXIS) if ndim == 3
                    else P(None, MODEL_AXIS))
        return P(None, MODEL_AXIS)  # kernel/qkernel.data [K, N] split N
    if any(f"/{p}/" in f"/{joined}/" for p in ROW_PARALLEL):
        if is_scale:
            if ndim == 2:  # int4 scale [K/group, N]: group rows shard with K
                return P(MODEL_AXIS, None)
            return P()  # output-channel scales replicate for row-parallel
        if is_bias:
            return P()  # added after the all-reduce on the full output
        if is_lora_a:
            # [K, r] / stacked [n, K, r] shards with the contraction; the
            # adapter partials join the base matmul's psum (added pre-reduce
            # in QLinear).
            return (P(None, MODEL_AXIS, None) if ndim == 3
                    else P(MODEL_AXIS, None))
        if is_lora_b:
            return P()  # [(n,) r, N] replicated
        return P(MODEL_AXIS, None)  # [K, N] split K
    return P()  # embeddings, norms: replicated


def params_pspecs(params) -> Any:
    """Tree of PartitionSpec matching ``params`` (QTensor leaves included —
    they are pytrees, so tree_map_with_path reaches .data/.scale)."""
    return jax.tree_util.tree_map_with_path(_param_spec, params)


def cache_pspecs(caches) -> Any:
    """Per-layer KV cache specs: batch over data, kv-heads over model."""

    def one(c):
        from ..models.mla import Int8MLACache, MLACache

        if isinstance(c, MLACache):
            # MLA latent caches are MQA-shared: replicate over the model
            # axis (they are ~(r+dr)/(2*KV*Dh) the size of a GQA cache),
            # shard batch over data.
            return MLACache(
                c=P(DATA_AXIS, None, None), p=P(DATA_AXIS, None, None),
                lengths=P(DATA_AXIS),
            )
        if isinstance(c, Int8MLACache):
            return Int8MLACache(
                cq=P(DATA_AXIS, None, None), cs=P(DATA_AXIS, None),
                pq=P(DATA_AXIS, None, None), ps=P(DATA_AXIS, None),
                lengths=P(DATA_AXIS),
            )
        from ..models.kv_cache import RingInt8KVCache

        if isinstance(c, RingInt8KVCache):
            # Same [B, KV, S(ring), Dh] layout as the dense int8 cache:
            # batch over data, kv-heads over model; window/sinks are static.
            return RingInt8KVCache(
                kq=P(DATA_AXIS, MODEL_AXIS, None, None),
                ks=P(DATA_AXIS, MODEL_AXIS, None),
                vq=P(DATA_AXIS, MODEL_AXIS, None, None),
                vs=P(DATA_AXIS, MODEL_AXIS, None),
                lengths=P(DATA_AXIS),
                window=c.window,
                sinks=c.sinks,
            )
        if isinstance(c, Int8KVCache):
            return Int8KVCache(
                kq=P(DATA_AXIS, MODEL_AXIS, None, None),
                ks=P(DATA_AXIS, MODEL_AXIS, None),
                vq=P(DATA_AXIS, MODEL_AXIS, None, None),
                vs=P(DATA_AXIS, MODEL_AXIS, None),
                lengths=P(DATA_AXIS),
            )
        if isinstance(c, BF16KVCache):
            return BF16KVCache(
                k=P(DATA_AXIS, None, MODEL_AXIS, None),
                v=P(DATA_AXIS, None, MODEL_AXIS, None),
                lengths=P(DATA_AXIS),
            )
        if isinstance(c, PagedInt8KVCache):
            # Page pools shard on the kv-head axis exactly like the dense
            # cache, and on the PAGE axis over ``data``: each batch-sharded
            # replica owns an independent pool (page-table entries are
            # replica-local ids, the engine keeps one allocator per replica),
            # so no page is ever written from two replicas. Inside shard_map
            # every replica sees the familiar single-pool program — the
            # local trash page is its last local page.
            return PagedInt8KVCache(
                kq=P(DATA_AXIS, MODEL_AXIS, None, None),
                ks=P(DATA_AXIS, MODEL_AXIS, None, None),
                vq=P(DATA_AXIS, MODEL_AXIS, None, None),
                vs=P(DATA_AXIS, MODEL_AXIS, None, None),
                page_table=P(DATA_AXIS, None),
                lengths=P(DATA_AXIS),
                page_size=c.page_size,
            )
        raise TypeError(type(c))

    return [one(c) for c in caches]


def shard_params(params, mesh):
    """device_put params according to the TP layout."""
    specs = params_pspecs(params)
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.device_put(params, shardings)
