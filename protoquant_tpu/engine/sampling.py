"""On-device sampling for the decode loop (greedy / temperature / top-k /
top-p nucleus / min-p / repetition penalty)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def apply_repetition_penalty(logits, counts, penalty: float):
    """HF-semantics repetition penalty: for every token already seen
    (count > 0), positive logits divide by ``penalty`` and negative logits
    multiply — pushing the probability down regardless of sign.

    counts: [B, V] int32 occurrence counts over prompt + generated tokens
    (the engine maintains them on device — see Engine.token_counts)."""
    if penalty == 1.0 or counts is None:
        return logits
    seen = counts > 0
    return jnp.where(
        seen, jnp.where(logits > 0, logits / penalty, logits * penalty), logits
    )


@partial(
    jax.jit,
    static_argnames=("temperature", "top_k", "top_p", "min_p", "penalty"),
)
def sample(
    logits: jnp.ndarray,  # [B, V] f32
    key: jax.Array,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    min_p: float = 0.0,
    counts: jnp.ndarray | None = None,  # [B, V] int32 (repetition penalty)
    penalty: float = 1.0,
) -> jnp.ndarray:
    """Returns next-token ids [B] int32. temperature == 0 -> greedy
    (repetition penalty still applies — it reshapes the argmax too)."""
    logits = apply_repetition_penalty(logits, counts, penalty)
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits < kth, -1e30, logits)
    if top_p < 1.0:
        # Nucleus: keep the smallest prefix of the sorted distribution whose
        # mass reaches top_p. The exclusive cumsum keeps every token whose
        # preceding mass is < top_p, so the top token always survives.
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1) - probs
        keep = cum < top_p
        # Smallest kept logit per row is the cutoff back in original order.
        cutoff = jnp.min(
            jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True
        )
        logits = jnp.where(logits < cutoff, -1e30, logits)
    if min_p > 0.0:
        # min-p: keep tokens whose probability is at least min_p x the top
        # token's (scale-adaptive truncation; the top token always survives).
        probs = jax.nn.softmax(logits, axis=-1)
        pmax = jnp.max(probs, axis=-1, keepdims=True)
        logits = jnp.where(probs < min_p * pmax, -1e30, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def token_logprob(logits: jnp.ndarray, tokens: jnp.ndarray) -> jnp.ndarray:
    """Log-probability of ``tokens`` [B] under pre-truncation ``logits``
    [B, V] (the serving-API convention: report the model's own logprob, not
    the sampler's truncated distribution)."""
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, tokens[:, None].astype(jnp.int32), 1)
    return picked[:, 0] - logz
