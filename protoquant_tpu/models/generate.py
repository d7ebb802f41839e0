"""Simple (non-batched-engine) greedy/sampled decode for eval & tests.

The continuous-batching serving loop lives in ``engine/``; this module is the
minimal prefill+decode loop used by acceptance config 3 (greedy-match +
perplexity, BASELINE.json:9) and by the eval harness.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .llama import LlamaModel, init_cache


@partial(jax.jit, static_argnames=("model",), donate_argnums=(3,))
def _prefill(model: LlamaModel, params, tokens, caches):
    B, T = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    logits, caches = model.apply(params, tokens, positions, caches)
    return logits[:, -1], caches


@partial(jax.jit, static_argnames=("model",), donate_argnums=(3,))
def _decode_step(model: LlamaModel, params, token, caches):
    """token: [B, 1]; one incremental step."""
    positions = caches[0].lengths[:, None]
    logits, caches = model.apply(params, token, positions, caches)
    return logits[:, -1], caches


def greedy_generate(
    model: LlamaModel,
    params,
    prompt: jnp.ndarray,  # [B, T] int32
    max_new_tokens: int,
    max_seq: int | None = None,
    kv_dtype=jnp.bfloat16,
):
    """Greedy decode; returns [B, max_new_tokens] generated ids."""
    B, T = prompt.shape
    if max_new_tokens == 0:
        return jnp.zeros((B, 0), jnp.int32)
    max_seq = max_seq or (T + max_new_tokens)
    caches = init_cache(model.cfg, B, max_seq, kv_dtype=kv_dtype)
    last_logits, caches = _prefill(model, params, prompt, caches)
    out = []
    token = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)
    out.append(token)
    for _ in range(max_new_tokens - 1):
        last_logits, caches = _decode_step(model, params, token[:, None], caches)
        token = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)
        out.append(token)
    return jnp.stack(out, axis=1)


@partial(jax.jit, static_argnames=("model",))
def score_tokens(model: LlamaModel, params, tokens: jnp.ndarray):
    """Mean negative log-likelihood of tokens[:, 1:] given tokens[:, :-1].

    exp(result) is perplexity. Cache-free full forward (scoring mode).
    """
    logits = model.apply(params, tokens[:, :-1])
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def perplexity(model, params, tokens) -> float:
    return float(jnp.exp(score_tokens(model, params, tokens)))
