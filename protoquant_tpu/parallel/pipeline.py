"""Pipeline parallelism (GPipe-style) — the SURVEY §2.2 'optional' strategy.

A scoring/prefill demonstrator: layers are split into contiguous stages over
a ``pipe`` mesh axis; microbatches stream through the ring with one
``ppermute`` hop per schedule step (M + P - 1 steps total). Every stage runs
the same SPMD program; off-window steps compute on garbage and their writes
are masked — the standard bubble, traded for code with no data-dependent
control flow.

Stage weights are the per-layer params stacked on a leading axis and sharded
over ``pipe`` (the scan-over-layers layout), so each device holds only its
own layers' (quantized) weights.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

try:
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from flax.linen import Embed
from jax.sharding import PartitionSpec as P

from ..models.llama import DecoderLayer, RMSNorm
from ..nn.qlinear import QLinear
from ..utils.config import ModelConfig


def stack_layer_params(params, num_layers: int):
    """{'layers_0': t0, 'layers_1': t1, ...} -> {'stacked': tree with a
    leading layer axis, 'rest': non-layer params}."""
    p = params["params"]
    layers = [p[f"layers_{i}"] for i in range(num_layers)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *layers)
    rest = {k: v for k, v in p.items() if not k.startswith("layers_")}
    return {"stacked": stacked, "rest": rest}


def build_pp_score(
    cfg: ModelConfig,
    mode: str,
    mesh,
    params_stacked,
    pipe_axis: str = "pipe",
    num_microbatches: int | None = None,
    dtype=None,
    int4_group: int = 128,
):
    """Returns jitted fn(stacked_params, tokens[B, T]) -> logits[B, T, V].

    ``params_stacked`` (from stack_layer_params) supplies the tree structure
    for the shard specs; pass the same tree at call time. B must divide by
    num_microbatches (default: pipe size); layers must divide by pipe size.
    """
    dtype = dtype or jnp.bfloat16
    P_size = mesh.shape[pipe_axis]
    M = num_microbatches or P_size
    L = cfg.num_hidden_layers
    if L % P_size:
        raise ValueError(f"layers {L} must divide over pipe={P_size}")

    layer_mod = DecoderLayer(cfg, mode, dtype, int4_group=int4_group)
    norm_mod = RMSNorm(cfg.rms_norm_eps, dtype)
    head_mod = QLinear(
        cfg.vocab_size, mode=mode, use_bias=False, dtype=dtype, int4_group=int4_group
    )
    embed_mod = Embed(
        cfg.vocab_size, cfg.hidden_size, dtype=dtype, param_dtype=jnp.float32
    )

    pspec = {
        "stacked": jax.tree_util.tree_map(
            lambda _: P(pipe_axis), params_stacked["stacked"]
        ),
        "rest": jax.tree_util.tree_map(lambda _: P(), params_stacked["rest"]),
    }

    @partial(
        _shard_map,
        mesh=mesh,
        in_specs=(pspec, P()),
        out_specs=P(),
        check_vma=False,
    )
    def fwd(params, tokens):
        B, T = tokens.shape
        if B % M:
            raise ValueError(f"batch {B} must divide into {M} microbatches")
        mbB = B // M
        r = jax.lax.axis_index(pipe_axis)
        rest = params["rest"]
        stacked = params["stacked"]  # leading axis = this stage's L/P layers

        positions = jnp.broadcast_to(jnp.arange(T)[None], (mbB, T))

        def run_stage(x):
            def one_layer(h, layer_params):
                h, _ = layer_mod.apply({"params": layer_params}, h, positions, None)
                return h, None

            x, _ = jax.lax.scan(one_layer, x, stacked)
            return x

        embeds = embed_mod.apply(
            {"params": rest["embed_tokens"]}, tokens.reshape(M, mbB, T)
        )  # [M, mbB, T, D]

        # Collect HIDDEN states during the ring (D-wide, not V-wide) and run
        # norm+lm_head once per microbatch after the scan — the head matmul
        # runs M times total instead of (M+P-1) times per stage, and the
        # final broadcast moves D-wide activations instead of logits.
        h_buf = jnp.zeros((M, mbB, T, cfg.hidden_size), dtype)
        buf = jnp.zeros((mbB, T, cfg.hidden_size), dtype)
        perm = [(i, (i + 1) % P_size) for i in range(P_size)]

        def step(carry, t):
            buf, h_buf = carry
            m_in = t - r  # microbatch index entering this stage at step t
            fresh = embeds[jnp.clip(m_in, 0, M - 1)]
            x_in = jnp.where(r == 0, fresh.astype(dtype), buf)
            y = run_stage(x_in)

            valid = (m_in >= 0) & (m_in < M) & (r == P_size - 1)
            slot = jnp.clip(m_in, 0, M - 1)
            # Mask the written slice, not the whole buffer.
            cur = jax.lax.dynamic_index_in_dim(h_buf, slot, 0, keepdims=False)
            write = jnp.where(valid, y, cur)
            h_buf = jax.lax.dynamic_update_index_in_dim(h_buf, write, slot, 0)

            buf = jax.lax.ppermute(y, pipe_axis, perm)
            return (buf, h_buf), None

        (buf, h_buf), _ = jax.lax.scan(
            step, (buf, h_buf), jnp.arange(M + P_size - 1)
        )

        # Broadcast the last stage's hidden states with one psum, then every
        # stage computes the (replicated) head locally.
        mask = (r == P_size - 1).astype(dtype)
        h_all = jax.lax.psum(h_buf * mask, pipe_axis)
        h = norm_mod.apply({"params": rest["norm"]}, h_all)
        logits = head_mod.apply({"params": rest["lm_head"]}, h).astype(jnp.float32)
        return logits.reshape(B, T, cfg.vocab_size)

    return jax.jit(fwd)
