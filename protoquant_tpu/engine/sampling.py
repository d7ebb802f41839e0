"""On-device sampling for the decode loop (greedy / temperature / top-k)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("temperature", "top_k"))
def sample(
    logits: jnp.ndarray,  # [B, V] f32
    key: jax.Array,
    temperature: float = 0.0,
    top_k: int = 0,
) -> jnp.ndarray:
    """Returns next-token ids [B] int32. temperature == 0 -> greedy."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits < kth, -1e30, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
