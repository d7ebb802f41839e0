"""EAGLE-style attention drafting (ROADMAP item 7 / VERDICT r3 missing 5).

The trained-proposer ladder in this stack: Medusa (independent per-depth
heads), Hydra (sequential heads conditioned on proposed tokens), and now
EAGLE — a ONE-LAYER autoregressive draft transformer over the target's
FEATURE space. Hydra's heads condition on token embeddings but see only a
per-tick state chain; EAGLE's draft layer ATTENDS over all previously
accumulated features through its own KV cache, which is what makes its
acceptance rates the published best of the draft-free tiers.

Design (EAGLE-1 shape, re-derived for this stack):

- Input at step t: concat(f_{t-1}, emb(x_t)) — the base feature that
  PREDICTED token x_t, plus x_t's embedding (the base model's table, passed
  in; no duplicate table in draft params). A fused ``fc`` projection maps
  2D -> D, then ONE standard decoder layer (the same Attention + MLP
  modules the base uses: rope, GQA, KV cache — all shared machinery) and a
  final RMSNorm produce the predicted next feature f̂_t.
- Token logits: an owned ``vocab`` projection over f̂ (same QLinear as a
  Medusa head; ``init_eagle`` copies the base lm_head weights into it when
  an fp base param tree is given, matching EAGLE's tied-head start).
- Autoregression: proposal k+1 consumes (f̂_k, emb(p_k)) — the draft's own
  predicted features chain through its own KV cache. Each TICK re-anchors
  on the TRUE base feature at the last accepted position (the scoring
  forward returns it), so feature drift is bounded by one window.
- Rollback: the draft cache is a standard cache (init_cache, 1 layer);
  the engine rewinds ``lengths`` to the committed frontier exactly like
  the draft-model tier — rows past the frontier are masked and overwritten.

Training (``train_eagle``): frozen base forward gives features
``hidden [B, T, D]``; teacher-forced draft input at position t is
(hidden[t-1], emb(tokens[t])) predicting tokens[t+1] (CE on the vocab
projection) plus a smooth-L1 feature-regression term pulling f̂_t toward
hidden[t] (the EAGLE combined loss: w_ce * CE + w_feat * SmoothL1 — the
regression is what keeps the autoregressive feature chain on-manifold).

Engine wiring (engine/engine.py ``eagle_draft``/``eagle_params``): a
LINEAR speculation tier — proposals + draft logits feed the SAME
rejection-sampling accept program as the draft-model tier, so greedy
streams are exact and temperature>0 streams are distribution-exact with
zero extra machinery. The scoring forward additionally returns the hidden
state at each slot's last accepted position (the next tick's true-feature
anchor).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .llama import DecoderLayer, LlamaModel, make_norm


def _draft_cfg(cfg):
    """One-layer copy of the base config for the draft decoder layer (same
    width/heads/rope, full-causal attention — the draft never windows)."""
    return dataclasses.replace(
        cfg, num_hidden_layers=1, sliding_window=0,
        attn_logit_softcap=0.0, num_local_experts=0,
    )


class EagleDraft(nn.Module):
    """One-layer feature-space draft model.

    ``__call__(feats [B,T,D], tok_embeds [B,T,D], positions [B,T], cache,
    advance)`` -> (next_feats [B,T,D] f32, logits [B,T,V] f32, cache).
    ``cache`` is the single layer's KV cache (element 0 of an
    init_cache(..., num_layers=1) list)."""

    cfg: Any  # base ModelConfig (width/vocab/rope read from it)
    mode: str = "fp"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, tok_embeds, positions, cache, advance=None):
        from ..nn.qlinear import QLinear

        D = self.cfg.hidden_size
        B, T = feats.shape[:2]
        x = jnp.concatenate(
            [feats.astype(self.dtype), tok_embeds.astype(self.dtype)],
            axis=-1,
        )
        x = QLinear(D, mode=self.mode, use_bias=True, dtype=self.dtype,
                    name="fc")(x.reshape(B * T, 2 * D)).reshape(B, T, D)
        dcfg = _draft_cfg(self.cfg)
        x, cache = DecoderLayer(
            dcfg, self.mode, self.dtype, layer_idx=0, name="layer"
        )(x, positions, cache, advance=advance)
        h = make_norm(dcfg, self.dtype, "norm")(x)
        logits = QLinear(
            self.cfg.vocab_size, mode=self.mode, use_bias=False,
            dtype=self.dtype, name="vocab",
        )(h.reshape(B * T, D)).reshape(B, T, -1)
        return h.astype(jnp.float32), logits.astype(jnp.float32), cache


def init_eagle(model: LlamaModel, rng=None, dtype=jnp.bfloat16,
               mode: str = "fp", base_params=None):
    """(EagleDraft module, draft_params). With an fp ``base_params`` tree,
    the draft's vocab projection starts as a COPY of the base lm_head (the
    EAGLE tied-head start: an untrained draft already decodes features the
    base emits)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    from .llama import init_cache

    draft = EagleDraft(cfg=model.cfg, mode=mode, dtype=dtype)
    D = model.cfg.hidden_size
    cache = init_cache(_draft_cfg(model.cfg), 1, 8, kv_dtype=jnp.float32)
    z = jnp.zeros((1, 1, D), dtype)
    pos = jnp.zeros((1, 1), jnp.int32)
    if mode != "fp":
        fp = EagleDraft(cfg=model.cfg, mode="fp", dtype=dtype).init(
            rng, z, z, pos, cache[0]
        )
        if base_params is not None:
            fp = _tie_vocab(fp, base_params)
        from ..nn.convert import quantize_params
        from ..utils.config import QuantConfig

        return draft, quantize_params(fp, QuantConfig(mode=mode))
    params = draft.init(rng, z, z, pos, cache[0])
    if base_params is not None:
        params = _tie_vocab(params, base_params)
    return draft, params


def _tie_vocab(draft_params, base_params):
    """Copy the base's (fp) lm_head kernel into the draft's vocab slot."""
    bp = base_params.get("params", base_params)
    head = bp.get("lm_head", {})
    if "kernel" not in head:
        return draft_params  # quantized base: keep the fresh init
    out = jax.tree_util.tree_map(lambda a: a, draft_params)
    out["params"]["vocab"] = {"kernel": head["kernel"]}
    return out


def quantize_eagle(draft: EagleDraft, draft_params, mode: str = "dynamic"):
    """Trained fp draft -> quantized serving draft (the framework's own
    conversion, like quantize_medusa)."""
    from ..nn.convert import quantize_params
    from ..utils.config import QuantConfig

    q = dataclasses.replace(draft, mode=mode)
    return q, quantize_params(draft_params, QuantConfig(mode=mode))


def _smooth_l1(x, beta: float = 1.0):
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def train_eagle(
    model: LlamaModel,
    params,
    draft: EagleDraft,
    draft_params,
    token_batches,  # iterable of [B, T] int32 arrays (text corpus)
    *,
    steps: int | None = None,
    lr: float = 1e-3,
    weight_decay: float = 0.0,
    w_ce: float = 0.1,
    w_feat: float = 1.0,
):
    """Self-distill the draft on text with the base frozen (the EAGLE
    combined loss: w_ce * token CE + w_feat * smooth-L1 feature
    regression). Returns (trained draft_params, per-step losses)."""
    import optax

    from .llama import init_cache

    opt = optax.adamw(lr, weight_decay=weight_decay)
    opt_state = opt.init(draft_params)
    emb_table = params.get("params", params)["embed_tokens"]["embedding"]

    @jax.jit
    def base_hidden(p, tokens):
        _, hidden = model.apply(p, tokens, return_hidden=True)
        return jax.lax.stop_gradient(hidden)

    @jax.jit
    def train_step(dp, os_, hidden, tokens):
        B, T = tokens.shape

        def loss_fn(d):
            # Draft input at position t (t = 1..T-1): feature that predicted
            # token t (hidden[t-1]) + emb(token t); predict token t+1 and
            # feature hidden[t].
            feats_in = hidden[:, : T - 1]
            embeds = emb_table[tokens[:, 1:]]
            positions = jnp.broadcast_to(
                jnp.arange(1, T)[None, :], (B, T - 1)
            )
            cache = init_cache(
                _draft_cfg(model.cfg), B, T, kv_dtype=jnp.float32
            )
            f_hat, logits, _ = draft.apply(
                d, feats_in, embeds, positions, cache[0]
            )
            # CE on positions predicting tokens[2:] (the last position has
            # no target).
            lg = logits[:, : T - 2]
            tg = tokens[:, 2:]
            lse = jax.nn.logsumexp(lg, axis=-1)
            picked = jnp.take_along_axis(lg, tg[..., None], axis=-1)[..., 0]
            ce = jnp.mean(lse - picked)
            feat = jnp.mean(
                _smooth_l1(f_hat[:, : T - 2] - hidden[:, 1 : T - 1])
            )
            return w_ce * ce + w_feat * feat

        loss, grads = jax.value_and_grad(loss_fn)(dp)
        updates, os_ = opt.update(grads, os_, dp)
        return optax.apply_updates(dp, updates), os_, loss

    losses = []
    for i, tokens in enumerate(token_batches):
        if steps is not None and i >= steps:
            break
        tokens = jnp.asarray(tokens, jnp.int32)
        hidden = base_hidden(params, tokens)
        draft_params, opt_state, loss = train_step(
            draft_params, opt_state, hidden, tokens
        )
        losses.append(float(loss))
    return draft_params, losses
