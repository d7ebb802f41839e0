"""Speculative decoding (draft-model lookahead; extension A3+).

Greedy speculative decoding: a small draft model proposes ``gamma`` tokens
autoregressively; the target model scores all of them in ONE forward
(T=gamma+1) and the longest agreeing prefix is accepted. Greedy acceptance
is *exactly equivalent* to target-only greedy decoding (tested), while the
target model runs ~(accepted+1)-tokens-per-forward instead of one.

The cache design makes rollback free: the target forward writes the draft
window's K/V at positions len..len+T-1 but is called with ``advance=0``, so
lengths do not move; after acceptance of ``a`` tokens we bump lengths by
exactly ``a`` (+1 for the token the target itself emitted, whose K/V is
computed next round). Rejected positions stay masked and are overwritten by
the next window — no copies, no rewinds.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .llama import LlamaModel, init_cache


@partial(jax.jit, static_argnames=("model",), donate_argnums=(3,))
def _prefill(model, params, tokens, caches):
    B, T = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    logits, caches = model.apply(params, tokens, positions, caches)
    return logits[:, -1], caches


@partial(jax.jit, static_argnames=("model",), donate_argnums=(3,))
def _decode_one(model, params, token, caches):
    positions = caches[0].lengths[:, None]
    logits, caches = model.apply(params, token, positions, caches)
    return logits[:, -1], caches


@partial(jax.jit, static_argnames=("model",), donate_argnums=(3,))
def _score_window(model, params, window, caches):
    """Score a [1, T] window against the cache WITHOUT advancing lengths.

    Returns per-position logits [1, T, V] and caches whose pools contain the
    window's K/V (masked until lengths advance)."""
    B, T = window.shape
    positions = caches[0].lengths[:, None] + jnp.arange(T)[None, :]
    logits, caches = model.apply(
        params, window, positions, caches, advance=jnp.zeros((B,), jnp.int32)
    )
    return logits, caches


@partial(jax.jit, static_argnames=("model",))
def _advance(model, caches, n):
    import dataclasses

    return [c.advance(n) for c in caches]


def speculative_generate(
    target_model: LlamaModel,
    target_params,
    draft_model: LlamaModel,
    draft_params,
    prompt: jnp.ndarray,  # [1, T] int32
    max_new_tokens: int,
    gamma: int = 4,
    max_seq: int | None = None,
    kv_dtype=jnp.float32,
):
    """Greedy speculative decode. Returns (tokens [1, n], stats dict)."""
    assert prompt.shape[0] == 1, "speculative_generate is single-sequence"
    T0 = prompt.shape[1]
    max_seq = max_seq or (T0 + max_new_tokens + gamma + 1)

    t_caches = init_cache(target_model.cfg, 1, max_seq, kv_dtype=kv_dtype)
    d_caches = init_cache(draft_model.cfg, 1, max_seq, kv_dtype=kv_dtype)

    t_logits, t_caches = _prefill(target_model, target_params, prompt, t_caches)
    _, d_caches = _prefill(draft_model, draft_params, prompt, d_caches)

    out = [int(jnp.argmax(t_logits, -1)[0])]
    stats = {"target_calls": 1, "draft_calls": 0, "proposed": 0, "accepted": 0}

    while len(out) < max_new_tokens:
        # Draft proposes gamma tokens starting from the last committed token,
        # then runs one extra step on its final proposal so the draft cache
        # holds K/V for EVERY window token (keeps the caches aligned when all
        # gamma proposals are accepted).
        window = [out[-1]]
        for _ in range(gamma):
            d_logits, d_caches = _decode_one(
                draft_model, draft_params, jnp.asarray([[window[-1]]], jnp.int32), d_caches
            )
            stats["draft_calls"] += 1
            window.append(int(jnp.argmax(d_logits, -1)[0]))
        _, d_caches = _decode_one(
            draft_model, draft_params, jnp.asarray([[window[-1]]], jnp.int32), d_caches
        )
        draft_tokens = window[1:]

        # Target scores the whole window in one forward (lengths frozen).
        w = jnp.asarray([window], jnp.int32)  # [1, gamma+1]
        logits, t_caches = _score_window(target_model, target_params, w, t_caches)
        stats["target_calls"] += 1
        greedy = np.asarray(jnp.argmax(logits[0], -1))  # [gamma+1]

        # Accept the longest prefix where the draft agrees with the target.
        accepted = 0
        while accepted < gamma and draft_tokens[accepted] == int(greedy[accepted]):
            accepted += 1
        stats["proposed"] += gamma
        stats["accepted"] += accepted

        emitted = draft_tokens[:accepted] + [int(greedy[accepted])]
        out.extend(emitted)

        # Commit: target cache holds K/V for window positions 0..T-1; the
        # prefix 0..accepted (the last committed token + accepted drafts) is
        # now permanent. The corrected token's K/V arrives next round.
        t_caches = _advance(target_model, t_caches, accepted + 1)
        # Draft cache already advanced per proposed token; rewind it to the
        # committed length by resetting lengths (its pools beyond are masked).
        import dataclasses

        committed = T0 + len(out) - 1  # minus the yet-unscored last token
        d_caches = [
            dataclasses.replace(c, lengths=jnp.full((1,), committed, jnp.int32))
            for c in d_caches
        ]

    stats["acceptance_rate"] = stats["accepted"] / max(1, stats["proposed"])
    return jnp.asarray([out[:max_new_tokens]], jnp.int32), stats
