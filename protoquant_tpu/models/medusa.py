"""Trained drafting heads (Medusa-style) for tree speculation.

The round-3 tree-speculation machinery (engine/engine.py: ancestor masks,
one-forward scoring, branch compaction via ``cache.reorder_tail``) is
proposal-source-agnostic: greedy acceptance commits only tokens the target
itself would have chosen, so ANY proposer preserves the exact greedy stream.
This module supplies the trained proposer tier the ROADMAP named: small
per-depth heads on the target's own final hidden state, self-distilled on
text so their candidates actually get accepted (n-gram lookup only fires on
repeated history; heads fire everywhere).

Design (Medusa-1 shape, re-derived for this stack):

- ``MedusaHeads``: head k (k = 1..depth) is one residual block
  ``h + silu(W1_k h)`` followed by a vocab projection — it predicts the
  token at position ``t + 1 + k`` from the hidden state that predicted
  ``t + 1``. Heads are plain fp (bf16/f32) flax Dense stacks: they are tiny
  next to the quantized base (2 * hidden * (hidden + vocab) params per
  head) and train in minutes on the frozen base.
- Training (``train_medusa_heads``): teacher-forced cross-entropy on text.
  One frozen base forward per batch gives ``hidden [B, T, D]``; head k's
  target at position t is ``tokens[t + 1 + k]``. Only head params train
  (optax.adamw); the quantized base never changes, so serving quality is
  untouched by construction.
- Proposal rule (``propose_from_heads``): branch j of the candidate tree
  takes the j-th best token from head 1 and the argmax of heads 2..depth.
  First tokens are distinct across branches by construction — identical
  first tokens share their fate under greedy acceptance, so scoring them
  twice wastes tree width (the same dedup rationale as
  ``engine._ngram_propose_branches``). Uncertainty concentrates at the
  first predicted position, so spending the whole branch budget there is
  the standard Medusa sparse-tree shape.

Engine wiring (engine/engine.py ``medusa_params``): the tree-scoring
forward already computes hidden states at every tree node; the heads run on
the hidden at each slot's LAST ACCEPTED node (the node whose greedy token
became the committed correction), producing the next tick's proposals in
the same XLA program — zero extra forwards. The first tick after prefill
proposes zeros (harmless: acceptance only commits matches).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .llama import LlamaModel


class MedusaHeads(nn.Module):
    """Per-depth drafting heads over the base model's final hidden state.

    ``__call__(hidden [..., D]) -> logits [..., depth, vocab]``.

    Built on QLinear so the heads quantize with the framework's own
    conversion: train at ``mode="fp"``, then
    ``quantize_params(head_params)`` + ``mode="dynamic"`` for serving —
    the head vocab projections are the dominant HBM read of a medusa tick
    (depth x D x V weights; measured 2.17 plain-step tick cost at fp32,
    bench/medusa_bench.py), so int8 heads cut the tick's weight traffic 4x.
    """

    depth: int
    vocab_size: int
    dtype: Any = jnp.bfloat16
    mode: str = "fp"  # "fp" (training) | "dynamic"/"weight_only" (serving)

    @nn.compact
    def __call__(self, hidden: jnp.ndarray) -> jnp.ndarray:
        from ..nn.qlinear import QLinear

        D = hidden.shape[-1]
        outs = []
        h = hidden.astype(self.dtype)
        lead = h.shape[:-1]
        h2 = h.reshape(-1, D)  # QLinear wants [tokens, features]
        for k in range(self.depth):
            r = QLinear(
                D, mode=self.mode, use_bias=True, dtype=self.dtype,
                name=f"res_{k}",
                # Zero-init the residual branch: untrained heads start as
                # plain linear probes of the hidden state, not noise.
                kernel_init=nn.initializers.zeros,
            )(h2)
            hk = h2 + nn.silu(r)
            outs.append(
                QLinear(
                    self.vocab_size, mode=self.mode, use_bias=False,
                    dtype=self.dtype, name=f"vocab_{k}",
                )(hk)
            )
        out = jnp.stack(outs, axis=-2).astype(jnp.float32)
        return out.reshape(*lead, self.depth, self.vocab_size)


def init_medusa(model: LlamaModel, depth: int, rng=None,
                dtype=jnp.bfloat16, mode: str = "fp"):
    """(heads_module, head_params) for ``model``'s width/vocab."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    heads = MedusaHeads(depth=depth, vocab_size=model.cfg.vocab_size,
                        dtype=dtype, mode=mode)
    if mode != "fp":
        # Serving layout: init fp then convert (zero-init kernels quantize
        # to exact zeros, preserving the linear-probe start).
        from ..nn.convert import quantize_params
        from ..utils.config import QuantConfig

        fp_heads = MedusaHeads(depth=depth, vocab_size=model.cfg.vocab_size,
                               dtype=dtype, mode="fp")
        fp = fp_heads.init(
            rng, jnp.zeros((1, 1, model.cfg.hidden_size), dtype)
        )
        return heads, quantize_params(fp, QuantConfig(mode=mode))
    params = heads.init(rng, jnp.zeros((1, 1, model.cfg.hidden_size), dtype))
    return heads, params


def quantize_medusa(heads: MedusaHeads, head_params, mode: str = "dynamic"):
    """Trained fp heads -> quantized serving heads (same scheme as the
    base model's projections: per-channel int8 + dynamic per-token acts)."""
    from ..nn.convert import quantize_params
    from ..utils.config import QuantConfig

    import dataclasses

    q_heads = dataclasses.replace(heads, mode=mode)
    return q_heads, quantize_params(head_params, QuantConfig(mode=mode))


def propose_from_heads(head_logits: jnp.ndarray, branches: int) -> jnp.ndarray:
    """[..., depth, V] head logits -> [..., branches, depth] candidate tree.

    Branch j = (j-th best of head 1, argmax of heads 2..depth). Matches the
    chain topology of ``engine._tree_topology``.
    """
    first = jax.lax.top_k(head_logits[..., 0, :], branches)[1]  # [..., J]
    rest = jnp.argmax(head_logits[..., 1:, :], axis=-1)  # [..., depth-1]
    d = head_logits.shape[-2]
    rest = jnp.broadcast_to(
        rest[..., None, :], (*first.shape, d - 1)
    )
    return jnp.concatenate([first[..., None], rest], axis=-1).astype(jnp.int32)


class HydraHeads(nn.Module):
    """SEQUENTIAL drafting heads (Hydra-style): head k conditions on the
    embedding of the (k-1)-th PROPOSED token, not just the base hidden —
    the known Medusa weakness is that deeper heads are unconditioned, so
    their acceptance collapses once the first prediction is uncertain.

    State chain: s_0 = hidden; s_k = s_{k-1} + silu(W_k [s_{k-1}; e_k])
    where e_k embeds the k-th chain token (the BASE model's embedding
    table, passed in — no duplicate table in the head params); head k's
    logits = V_k s_k. Same QLinear construction as MedusaHeads, so
    quantize_medusa applies unchanged.

    Two entry points over the same params:
    - ``__call__(hidden [N,D], chain_embeds [N,depth,D])`` teacher-forced
      logits [N, depth, V] (training).
    - ``propose(hidden [B,D], emb_table [V,D], branches)`` -> candidates
      [B, branches, depth]: top-``branches`` from head 1, then each branch
      chains argmax proposals conditioned on ITS OWN tokens (per-branch
      deep proposals — unlike Medusa's shared argmax tail).
    """

    depth: int
    vocab_size: int
    hidden_size: int
    dtype: Any = jnp.bfloat16
    mode: str = "fp"

    def setup(self):
        from ..nn.qlinear import QLinear

        self.res = [
            QLinear(self.hidden_size, mode=self.mode, use_bias=True,
                    dtype=self.dtype, kernel_init=nn.initializers.zeros,
                    name=f"res_{k}")
            for k in range(self.depth)
        ]
        self.vocab = [
            QLinear(self.vocab_size, mode=self.mode, use_bias=False,
                    dtype=self.dtype, name=f"vocab_{k}")
            for k in range(self.depth)
        ]

    def _step(self, s, e, k):
        # The residual block maps [s; e] (2D wide) -> D.
        x = jnp.concatenate([s, e.astype(s.dtype)], axis=-1)
        s_next = s + nn.silu(self.res[k](x))
        return s_next, self.vocab[k](s_next).astype(jnp.float32)

    def __call__(self, hidden, chain_embeds):
        lead = hidden.shape[:-1]
        D = hidden.shape[-1]
        s = hidden.reshape(-1, D).astype(self.dtype)
        ce = chain_embeds.reshape(-1, self.depth, D)
        outs = []
        for k in range(self.depth):
            s, lg = self._step(s, ce[:, k], k)
            outs.append(lg)
        out = jnp.stack(outs, axis=-2)
        return out.reshape(*lead, self.depth, self.vocab_size)

    def propose(self, hidden, root_tokens, emb_table, branches: int):
        """[B, D] hidden (the state that PREDICTED the root token) +
        [B] root tokens -> [B, branches, depth] candidates.

        Head 0 conditions on the root's embedding and yields the top-J
        distinct depth-1 candidates; each branch then chains: head k
        conditions on THAT branch's depth-k candidate. All branches share
        the depth-1 state (common root prefix)."""
        B, D = hidden.shape
        emb = emb_table.astype(self.dtype)
        s, lg = self._step(hidden.astype(self.dtype), emb[root_tokens], 0)
        first = jax.lax.top_k(lg, branches)[1].astype(jnp.int32)  # [B, J]
        cols = [first]
        sj = jnp.broadcast_to(s[:, None, :], (B, branches, D)).reshape(-1, D)
        tok = first.reshape(-1)
        for k in range(1, self.depth):
            sj, lgk = self._step(sj, emb[tok], k)
            tok = jnp.argmax(lgk, axis=-1).astype(jnp.int32)
            cols.append(tok.reshape(B, branches))
        return jnp.stack(cols, axis=-1)  # [B, J, depth]


def init_hydra(model: LlamaModel, depth: int, rng=None,
               dtype=jnp.bfloat16, mode: str = "fp"):
    """(HydraHeads module, head_params) for ``model``'s width/vocab."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    D = model.cfg.hidden_size
    heads = HydraHeads(depth=depth, vocab_size=model.cfg.vocab_size,
                       hidden_size=D, dtype=dtype, mode=mode)
    if mode != "fp":
        from ..nn.convert import quantize_params
        from ..utils.config import QuantConfig

        fp = HydraHeads(depth=depth, vocab_size=model.cfg.vocab_size,
                        hidden_size=D, dtype=dtype, mode="fp").init(
            rng, jnp.zeros((1, D), dtype), jnp.zeros((1, depth, D), dtype)
        )
        return heads, quantize_params(fp, QuantConfig(mode=mode))
    params = heads.init(
        rng, jnp.zeros((1, D), dtype), jnp.zeros((1, depth, D), dtype)
    )
    return heads, params


def _chain_embeds(tokens, emb_table, depth):
    """[B, T] tokens -> [B, T, depth, D] teacher-forced chain embeddings:
    head k (0-based) at position t conditions on token t+1+k (zero-padded
    out-of-range — those positions are masked out of the loss)."""
    B, T = tokens.shape
    cols = []
    for k in range(depth):
        ids = jnp.pad(tokens[:, 1 + k :], ((0, 0), (0, min(1 + k, T))))[:, :T]
        cols.append(emb_table[ids])
    return jnp.stack(cols, axis=2)


def _hydra_loss(heads, head_params, hidden, tokens, emb_table, depth):
    """Teacher-forced CE for sequential heads: head k (0-based) at
    position t conditions on the TRUE token t+1+k and predicts t+2+k."""
    ce = _chain_embeds(tokens, emb_table, depth)
    logits = heads.apply(head_params, hidden, ce)  # [B, T, depth, V]
    B, T = tokens.shape
    total = jnp.float32(0)
    count = jnp.float32(0)
    for k in range(depth):
        n = T - 2 - k
        if n <= 0:
            continue
        lg = logits[:, :n, k, :]
        tg = tokens[:, 2 + k : 2 + k + n]
        lse = jax.nn.logsumexp(lg, axis=-1)
        picked = jnp.take_along_axis(lg, tg[..., None], axis=-1)[..., 0]
        total = total + jnp.sum(lse - picked)
        count = count + n * B
    return total / jnp.maximum(count, 1.0)


def _head_loss(heads, head_params, hidden, tokens, depth):
    """Teacher-forced CE: head k at position t predicts tokens[t + 1 + k].

    hidden [B, T, D] is the FROZEN base's final-norm output on ``tokens``;
    position t's lm_head target is tokens[t+1], so head k's is tokens[t+1+k].
    """
    logits = heads.apply(head_params, hidden)  # [B, T, depth, V]
    B, T = tokens.shape
    total = jnp.float32(0)
    count = jnp.float32(0)
    for k in range(1, depth + 1):
        n = T - 1 - k
        if n <= 0:
            continue
        lg = logits[:, :n, k - 1, :]
        tg = tokens[:, 1 + k : 1 + k + n]
        lse = jax.nn.logsumexp(lg, axis=-1)
        picked = jnp.take_along_axis(lg, tg[..., None], axis=-1)[..., 0]
        total = total + jnp.sum(lse - picked)
        count = count + n * B
    return total / jnp.maximum(count, 1.0)


def train_medusa_heads(
    model: LlamaModel,
    params,
    heads: MedusaHeads,
    head_params,
    token_batches,  # iterable of [B, T] int32 arrays (text corpus)
    *,
    steps: int | None = None,
    lr: float = 1e-3,
    weight_decay: float = 0.0,
):
    """Self-distill the heads on text with the base frozen.

    Returns (trained head_params, list of per-step losses). One base forward
    per batch (cache-less full-sequence scoring, ``return_hidden=True``);
    the head train step is a separate jit so the expensive base forward is
    reused across epochs over the same batch iterable if the caller loops.
    """
    import optax

    opt = optax.adamw(lr, weight_decay=weight_decay)
    opt_state = opt.init(head_params)
    depth = heads.depth

    is_hydra = isinstance(heads, HydraHeads)
    emb_table = (
        params.get("params", params)["embed_tokens"]["embedding"]
        if is_hydra else None
    )

    @partial(jax.jit, static_argnames=())
    def base_hidden(p, tokens):
        _, hidden = model.apply(p, tokens, return_hidden=True)
        return jax.lax.stop_gradient(hidden)

    @jax.jit
    def train_step(hp, os_, hidden, tokens):
        def loss_fn(h):
            if is_hydra:
                return _hydra_loss(heads, h, hidden, tokens, emb_table, depth)
            return _head_loss(heads, h, hidden, tokens, depth)

        loss, grads = jax.value_and_grad(loss_fn)(hp)
        updates, os_ = opt.update(grads, os_, hp)
        return optax.apply_updates(hp, updates), os_, loss

    losses = []
    for i, tokens in enumerate(token_batches):
        if steps is not None and i >= steps:
            break
        tokens = jnp.asarray(tokens, jnp.int32)
        hidden = base_hidden(params, tokens)
        head_params, opt_state, loss = train_step(
            head_params, opt_state, hidden, tokens
        )
        losses.append(float(loss))
    return head_params, losses
