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


def apply_presence_frequency(logits, counts, pres, freq):
    """OpenAI-style additive penalties over the [B, V] occurrence counts
    (prompt + generated, the same counts the repetition penalty uses):

        logits -= frequency_penalty * count + presence_penalty * (count > 0)

    pres/freq: [B] f32 per-request strengths (0 = off). Applied before
    filtering AND before the greedy argmax, so they reshape greedy rows too."""
    if counts is None or (pres is None and freq is None):
        return logits
    c = counts.astype(jnp.float32)
    out = logits
    if freq is not None:
        out = out - freq[:, None] * c
    if pres is not None:
        out = out - pres[:, None] * (c > 0).astype(jnp.float32)
    return out


def processed_logits(
    logits: jnp.ndarray,  # [B, V] f32
    temps: jnp.ndarray,  # [B] f32
    top_ks: jnp.ndarray,  # [B] int32 (0 => no top-k)
    top_ps: jnp.ndarray,  # [B] f32 (1.0 => no nucleus truncation)
    min_ps: jnp.ndarray,  # [B] f32 (0.0 => no min-p truncation)
) -> jnp.ndarray:
    """The filtered sampling distribution as logits [B, V]: temperature,
    top-k, top-p, min-p applied (masked entries -> -1e30). softmax of this
    is the exact distribution sample_batched draws from for temp > 0 rows —
    rejection-sampling speculation (engine._spec_score_and_accept_body)
    reuses it so target-invariance holds filter-for-filter."""
    B, V = logits.shape
    t = jnp.maximum(temps, 1e-6)[:, None]
    scaled = logits / t
    sorted_desc = jnp.sort(scaled, axis=-1)[:, ::-1]
    # top-k: per-row k-th largest logit is the cutoff (k=0 -> keep all).
    k_eff = jnp.where(top_ks > 0, jnp.clip(top_ks, 1, V), V).astype(jnp.int32)
    kth = jnp.take_along_axis(sorted_desc, (k_eff - 1)[:, None], axis=-1)
    scaled = jnp.where(scaled < kth, -1e30, scaled)
    # top-p nucleus: exclusive-cumsum mass threshold (top token survives).
    probs_sorted = jax.nn.softmax(sorted_desc, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1) - probs_sorted
    keep = cum < top_ps[:, None]
    cutoff = jnp.min(
        jnp.where(keep, sorted_desc, jnp.inf), axis=-1, keepdims=True
    )
    scaled = jnp.where(scaled < cutoff, -1e30, scaled)
    # min-p: keep tokens with prob >= min_p x the top token's.
    probs = jax.nn.softmax(scaled, axis=-1)
    pmax = jnp.max(probs, axis=-1, keepdims=True)
    return jnp.where(probs < min_ps[:, None] * pmax, -1e30, scaled)


def sample_batched(
    logits: jnp.ndarray,  # [B, V] f32
    key: jax.Array,
    temps: jnp.ndarray,  # [B] f32 (0 => greedy for that row)
    top_ks: jnp.ndarray,  # [B] int32 (0 => no top-k)
    top_ps: jnp.ndarray,  # [B] f32 (1.0 => no nucleus truncation)
    min_ps: jnp.ndarray,  # [B] f32 (0.0 => no min-p truncation)
    counts: jnp.ndarray | None = None,  # [B, V] int32 (repetition penalty)
    penalty: float = 1.0,
    pres: jnp.ndarray | None = None,  # [B] f32 presence penalties
    freq: jnp.ndarray | None = None,  # [B] f32 frequency penalties
) -> jnp.ndarray:
    """Per-row sampling: every request in the batch can carry its own
    temperature/top-k/top-p/min-p (and presence/frequency penalties), all
    traced — ONE compiled program serves heterogeneous sampling configs
    (and config changes never recompile). Greedy rows (temp == 0) take the
    post-penalty argmax exactly."""
    logits = apply_repetition_penalty(logits, counts, penalty)
    logits = apply_presence_frequency(logits, counts, pres, freq)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = processed_logits(logits, temps, top_ks, top_ps, min_ps)
    if key.ndim == 2:
        # PER-ROW keys [B, 2] (per-request seeds: each slot's draw chain is
        # independent of batch co-tenants — engine/engine.py key plumbing).
        sampled = jax.vmap(
            lambda k, l: jax.random.categorical(k, l, axis=-1)
        )(key, scaled).astype(jnp.int32)
    else:
        sampled = jax.random.categorical(key, scaled, axis=-1).astype(
            jnp.int32
        )
    return jnp.where(temps == 0.0, greedy, sampled)


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
    """Uniform-config convenience over sample_batched. temperature == 0 ->
    greedy (repetition penalty still applies — it reshapes the argmax too);
    the pure-greedy case skips the sort/softmax machinery entirely."""
    if temperature == 0.0:
        logits = apply_repetition_penalty(logits, counts, penalty)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    B = logits.shape[0]
    full = lambda v, dt: jnp.full((B,), v, dt)
    return sample_batched(
        logits,
        key,
        full(temperature, jnp.float32),
        full(top_k, jnp.int32),
        full(top_p, jnp.float32),
        full(min_p, jnp.float32),
        counts,
        penalty,
    )


def token_logprob(logits: jnp.ndarray, tokens: jnp.ndarray) -> jnp.ndarray:
    """Log-probability of ``tokens`` [B] under pre-truncation ``logits``
    [B, V] (the serving-API convention: report the model's own logprob, not
    the sampler's truncated distribution)."""
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, tokens[:, None].astype(jnp.int32), 1)
    return picked[:, 0] - logz


def top_logprobs(logits: jnp.ndarray, k: int):
    """Top-k alternative (logprob, token) pairs per position under the
    same pre-truncation convention as token_logprob (OpenAI
    ``top_logprobs``: the k most likely tokens at each position with
    their logprobs, independent of what was sampled).

    logits [..., V] -> (vals [..., k] f32 descending, idx [..., k] int32).
    """
    logz = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
    vals, idx = jax.lax.top_k(logits, k)
    return vals - logz, idx.astype(jnp.int32)
