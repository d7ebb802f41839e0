"""Continuous-batching serving engine (component A3; SURVEY.md §3.4).

The reference stops at a single linear layer; the driver mandates a full
serving path (BASELINE.json north_star). Host-side Python owns request
bookkeeping (queue, slots, stop conditions); the device owns everything else
— one jitted program per prefill bucket and ONE jitted decode step for the
whole batch per tick (host->TPU dispatch happens once per step, not per op,
unlike the reference's per-op CUDA launches, SURVEY.md §3.2 vs §3.4).

Slots: the KV cache is allocated once at [max_batch, max_seq]; requests are
admitted into free slots (prefill writes that slot's rows), decode advances
every active slot in lock-step, finished slots are recycled. Inactive slots
run the same program with advance=0, so their lengths freeze and their cache
rows stay masked.
"""

from __future__ import annotations

import dataclasses
import time
from collections import deque
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import LlamaModel, init_cache
from ..utils.config import EngineConfig
from .health import StepWatchdog, check_finite
from .sampling import sample

NEG_INF_LOGIT = -1e30  # guided-decoding mask value (matches sampling.py)


@dataclasses.dataclass
class Request:
    rid: int
    prompt: list
    max_new_tokens: int
    out: list = dataclasses.field(default_factory=list)
    slot: int = -1
    done: bool = False
    pages: list = dataclasses.field(default_factory=list)  # paged layout
    shared_pages: list = dataclasses.field(default_factory=list)  # prefix hits
    held_pages: list = dataclasses.field(default_factory=list)  # refs we hold
    eos_id: "int | None" = None  # per-request stop token
    on_token: "object" = None  # optional callback(rid, token) for streaming
    prefill_off: int = 0  # tokens of the prompt already prefetched into KV
    adapter_id: int = 0  # multi-LoRA stack index (0 = base model)
    # Stop sequences: token-id lists; generation retires when the output's
    # suffix matches any of them (multi-token analogue of eos_id).
    stop_sequences: list = dataclasses.field(default_factory=list)
    # eos/stop-sequences are ignored until this many tokens generated.
    min_new_tokens: int = 0
    # Per-request sampling overrides (None = engine-config default).
    temperature: "float | None" = None
    top_k: "int | None" = None
    top_p: "float | None" = None
    min_p: "float | None" = None
    presence_penalty: "float | None" = None
    frequency_penalty: "float | None" = None
    last_logits: "object" = None  # final-position logits of the last chunk
    logprobs: list = dataclasses.field(default_factory=list)  # per out token
    want_logprobs: bool = False  # per-request opt-in (OpenAI logprobs)
    # OpenAI top_logprobs: k most-likely alternatives per emitted token.
    # 0 = off; when >0, top_lps[i] is a list of (token_id, logprob) pairs
    # (descending) for output token i, k entries each.
    top_logprobs: int = 0
    top_lps: list = dataclasses.field(default_factory=list)
    seed: "int | None" = None  # per-request sampling seed (OpenAI seed)
    t_admit: float = 0.0  # perf_counter at slot assignment (prefill timing)
    t_enqueue: float = 0.0  # perf_counter at add_request (queue-wait timing)
    cancelled: bool = False  # retired early via Engine.cancel()
    priority: int = 0  # admission priority (scheduler="priority")
    # Guided decoding: callable(tokens_so_far: list[int]) -> [V] bool
    # (True = allowed). Called on the host each tick — the FSM/grammar
    # state lives in the callable; the mask applies on-device before
    # sampling. None = unconstrained.
    logit_mask_fn: "object" = None
    # OpenAI-style logit_bias: {token_id: delta} added to the logits before
    # sampling on every step. Composes with logit_mask_fn.
    logit_bias: "dict | None" = None
    _bias_row: "object" = None  # cached dense [V] row built from logit_bias


def _bucket(n: int, chunk: int, lo: int = 16) -> int:
    """Pad prefill length to a small set of buckets to bound compile count."""
    b = lo
    while b < n:
        b *= 2
    return min(b, max(chunk, lo))


@partial(
    jax.jit,
    static_argnames=("model", "penalty", "top_lp"),
    donate_argnums=(2,),
)
def _decode_step(
    model: LlamaModel,
    params,
    caches,
    last_tokens,  # [B] int32
    active,  # [B] bool
    key,
    samp,  # dict of [B] arrays: temps/top_ks/top_ps/min_ps (per-request)
    penalty: float = 1.0,
    counts=None,  # [B, V] int32 occurrence counts (repetition penalty)
    adapter_ids=None,  # [B] int32 multi-LoRA selection
    logit_bias=None,  # [B, V] f32 added pre-sampling (guided decoding:
    #                   masks are -1e30 entries; logit_bias dicts are deltas)
    top_lp: int = 0,  # >0: also return top-k alternatives (vals, idx)
):
    from .sampling import sample_batched, token_logprob, top_logprobs

    max_pos = model.cfg.max_position_embeddings - 1
    positions = jnp.minimum(caches[0].lengths, max_pos)[:, None]
    advance = active.astype(jnp.int32)
    logits, caches = model.apply(
        params, last_tokens[:, None], positions, caches, advance=advance,
        adapter_ids=adapter_ids,
    )
    last = logits[:, -1]
    if logit_bias is not None:
        # Guided decoding: applied BEFORE sampling, so greedy/top-k/top-p
        # all draw from the constrained distribution and reported logprobs
        # are the constrained ones.
        last = last + logit_bias
    next_tokens = sample_batched(
        last, key, samp["temps"], samp["top_ks"], samp["top_ps"],
        samp["min_ps"], counts, penalty,
        pres=samp.get("pres_pens"), freq=samp.get("freq_pens"),
    )
    logprobs = token_logprob(last, next_tokens)
    tl = top_logprobs(last, top_lp) if top_lp else None
    if counts is not None:
        b = jnp.arange(next_tokens.shape[0])
        counts = counts.at[b, next_tokens].add(active.astype(jnp.int32))
    return next_tokens, logprobs, tl, counts, caches


class Engine:
    """Continuous-batching inference engine over a quantized LlamaModel."""

    def __init__(
        self,
        model: LlamaModel,
        params,
        config: EngineConfig | None = None,
        kv_dtype=jnp.int8,
        kv_layout: str = "dense",  # "dense" | "paged"
        debug_checks: bool = False,  # NaN/Inf detection per step (syncs)
        step_budget_s: "float | None" = None,  # watchdog threshold
        #              (None = adaptive: 30x rolling-median step, 120s floor)
        mesh=None,  # optional (data=dp, model=tp) mesh: sharded serving
        #            (model must be built via parallel.tp_model; params sharded)
        draft_model: "LlamaModel | None" = None,  # speculative decode mode
        draft_params=None,
        gamma: int = 4,  # draft lookahead per tick (speculative modes);
        #                  the CAP when adaptive_gamma is on
        prompt_lookup: int = 0,  # n-gram length for draft-free speculation
        #                          (0 = off): proposals are copied from the
        #                          request's own history where its trailing
        #                          n-gram last occurred. Acceptance keeps the
        #                          stream exactly greedy (temp 0) /
        #                          distribution-exact (temp > 0) whatever the
        #                          proposal source, so this needs no draft
        #                          model and no second KV cache.
        adaptive_gamma: bool = False,  # adapt lookahead in [1, gamma] from
        #                                the measured per-tick acceptance rate
        lookup_branches: int = 1,  # >1 turns prompt-lookup speculation into
        #   TREE speculation (Medusa-style candidate trees, draft-free): up
        #   to `lookup_branches` distinct n-gram continuations are scored in
        #   ONE forward with an ancestor attention mask; the accepted branch
        #   commits (its K/V rows compact into chain order —
        #   cache.reorder_tail). Greedy rows accept the longest greedy-match
        #   prefix; sampled rows use distribution-exact tree rejection
        #   sampling (root multi-round + per-node chain rejection). Dense
        #   caches only.
        medusa_heads=None,  # MedusaHeads module (models/medusa.py): TRAINED
        #   drafting heads replace n-gram lookup as the tree's proposal
        #   source. The scoring forward itself emits next tick's candidates
        #   (heads on the hidden state at each slot's last accepted node), so
        #   proposals cost zero extra forwards. Same constraints as tree
        #   speculation; tree shape = lookup_branches x gamma, needing
        #   heads.depth >= gamma.
        medusa_params=None,
        eagle_draft=None,  # EagleDraft module (models/eagle.py): ONE-LAYER
        #   feature-space autoregressive draft (attends over accumulated
        #   features through its own KV cache; the published-best draft-free
        #   tier). lookup_branches == 1: a LINEAR speculation mode —
        #   proposals + draft logits feed the same rejection-sampling
        #   accept program as draft-model speculation, so greedy is exact
        #   and temperature>0 is distribution-exact. lookup_branches > 1:
        #   EAGLE-TREE mode (EAGLE-2-style) — the draft's step-1 top-J
        #   candidates each continue greedily to depth gamma and the whole
        #   [B, 1+J*gamma] candidate tree scores in ONE forward
        #   (_tree_score_and_accept; same exactness guarantees, tree
        #   rejection sampling). Each tick re-anchors on the TRUE base
        #   feature at the last accepted position (the scoring forward
        #   returns it); the first tick after prefill anchors on zeros
        #   (junk proposals for one tick, never a wrong token).
        eagle_params=None,
        scheduler: str = "fcfs",  # admission policy when slots free up:
        #   "fcfs"     — arrival order (default; maximal fairness)
        #   "priority" — higher Request.priority first, FIFO within a tier
        #                (aging: +1 effective tier per 60s waited, so low
        #                tiers cannot starve)
        #   "sjf"      — shortest prompt first (maximizes slot turnover /
        #                throughput under mixed lengths; FIFO tiebreak)
    ):
        self.model = model
        self.params = params
        self.cfg = config or EngineConfig()
        self.kv_dtype = kv_dtype
        self.kv_layout = kv_layout
        self.draft_model = draft_model
        self.draft_params = draft_params
        self.gamma = gamma
        self._gamma_cur = gamma
        self.adaptive_gamma = adaptive_gamma
        self.prompt_lookup = prompt_lookup
        self.lookup_branches = lookup_branches
        self.medusa_heads = medusa_heads
        self.medusa_params = medusa_params
        if (medusa_heads is None) != (medusa_params is None):
            raise ValueError("medusa_heads and medusa_params go together")
        if medusa_heads is not None:
            if prompt_lookup or draft_model is not None:
                raise ValueError(
                    "medusa heads are exclusive with prompt_lookup / "
                    "draft_model (one proposal source per engine)"
                )
            if medusa_heads.depth < gamma:
                raise ValueError(
                    f"medusa_heads.depth={medusa_heads.depth} < gamma={gamma}"
                )
            # adaptive_gamma composes with trees since round 5: depth
            # adapts in [1, gamma] on measured acceptance exactly like the
            # linear tiers (one compiled scoring program per (J, depth) —
            # bounded by the gamma range, same budget as linear).
        self.eagle_draft = eagle_draft
        self.eagle_params = eagle_params
        if (eagle_draft is None) != (eagle_params is None):
            raise ValueError("eagle_draft and eagle_params go together")
        if eagle_draft is not None:
            if prompt_lookup or draft_model is not None \
                    or medusa_heads is not None:
                raise ValueError(
                    "eagle_draft is exclusive with prompt_lookup / "
                    "draft_model / medusa_heads (one proposal source per "
                    "engine)"
                )
        tree_mode = lookup_branches > 1 or medusa_heads is not None
        if (lookup_branches > 1 and not prompt_lookup
                and medusa_heads is None and eagle_draft is None):
            raise ValueError(
                "lookup_branches needs a tree proposal source: "
                "prompt_lookup > 0, medusa_heads, or eagle_draft"
            )
        if tree_mode:
            if kv_dtype == jnp.int4 or kv_dtype == "k4v8":
                # KIVI-tailed caches (int4 and the round-5 K4V8 mixed
                # tier): candidate K nodes live in the int8 tail, so
                # reorder_tail never touches packed nibbles — but only
                # while the tree window fits ONE chunk (beyond that, node
                # writes recycle tail rows attention still reads).
                from ..models.kv_cache import INT4_KV_GROUP

                width = 1 + lookup_branches * gamma
                if width > INT4_KV_GROUP:
                    raise ValueError(
                        f"tree speculation + KIVI-tailed KV: tree width "
                        f"{width} (1 + branches*gamma) exceeds the KIVI "
                        f"chunk ({INT4_KV_GROUP}) — node writes would "
                        "recycle live int8 tail rows; narrow the tree"
                    )
            if kv_dtype == "k8v4":
                raise NotImplementedError(
                    "tree speculation + mixed K8V4 KV: the packed-nibble V "
                    "store has no reorder_tail (branch compaction would "
                    "rewrite merged nibbles); use kv_bits=8 or full int4"
                )
            # Tree speculation + ring layout composes since round 5 (the
            # last layout-reasoned tree guard): candidate writes and the
            # reorder_tail compaction map positions to ring columns
            # (RingInt8KVCache.reorder_tail), the XLA attention derives
            # node indices from reconstructed absolute positions, and the
            # ring is sized below so its slack covers the tree width. The
            # window itself must clear the tree (models/llama.py asserts
            # sliding_window > width at scoring time) — checked eagerly
            # here for a readable error.
            if kv_layout == "ring":
                width = 1 + lookup_branches * max(gamma, 1)
                ring_win = self.cfg.stream_window or model.cfg.sliding_window
                if 0 < ring_win <= width:
                    raise ValueError(
                        f"tree speculation + ring layout: the sliding "
                        f"window ({ring_win}) must exceed the tree width "
                        f"({width} = 1 + branches*gamma) — in-window "
                        "candidate nodes must never fall behind any "
                        "node's window lower bound"
                    )
            # Tree speculation + prefix cache compose since round 5
            # (VERDICT r4 item 7; the round-3 guard was conservative).
            # Quarantine argument: (a) publication covers only FULL prompt
            # pages (prefix_cache.publish caps at len(prompt)//ps), and it
            # runs at prefill end — before any tree tick for that request;
            # (b) tree-transient writes (scoring with advance=0, and the
            # reorder_tail compaction) land at positions >= the slot's
            # frontier, which is strictly beyond every published page at
            # all times (shared pages end at matched_tokens <= prompt
            # end <= frontier); (c) losing-branch garbage therefore lives
            # only in the request's PRIVATE tail pages, freed (never
            # published) at retirement. Exactness tests:
            # tests/test_prefix_cache.py tree x prefix section.
        self._tree_mode = tree_mode
        if scheduler not in ("fcfs", "priority", "sjf"):
            raise ValueError(f"unknown scheduler {scheduler!r}")
        self.scheduler = scheduler
        if prompt_lookup and draft_model is not None:
            raise ValueError("prompt_lookup and draft_model are exclusive")
        self.mesh = mesh
        # Speculative modes under a mesh: the target's score-and-accept runs
        # under shard_map (window/draft-logits batch-sharded over data); the
        # draft stays REPLICATED and proposes for the full batch outside the
        # mesh — mathematically identical everywhere, redundant draft compute
        # per replica (the draft is small by design; a batch-sharded draft is
        # a perf refinement, not a correctness need).
        B = self.cfg.max_batch_size
        self._dp = 1
        if mesh is not None:
            from ..parallel.mesh import DATA_AXIS

            dp = mesh.shape[DATA_AXIS]
            if B % dp:
                raise ValueError(f"max_batch_size {B} must divide by dp={dp}")
            self._dp = dp
            self._tp_fns = _build_tp_engine_fns(model, mesh)
        else:
            self._tp_fns = None
        self.prefix = None
        if self.cfg.prefix_cache and kv_layout != "paged":
            raise ValueError("prefix_cache requires kv_layout='paged'")
        if kv_layout == "paged":
            # Paged INT8 layout: one pool sized for the full budget, requests
            # reserve only the pages they can use; the page free list is the
            # native C++ allocator (protoquant_tpu.native).
            #
            # Under dp>1 each batch-sharded replica owns an INDEPENDENT pool
            # (pools shard over the data axis alongside the slots that write
            # them — shardings.cache_pspecs): page-table entries are
            # replica-LOCAL page ids, and the host keeps one allocator per
            # replica. No page is ever shared across the data axis, so the
            # divergence a shared pool would suffer cannot arise.
            from ..native import PageAllocator
            from .paged_kv import PagedInt8KVCache

            if kv_dtype != jnp.int8:
                # Was silently ignored before round 5 — the pool class is
                # int8; serving int8 pages under an int4/k4v8 request would
                # lie about the memory budget the caller asked for.
                raise ValueError(
                    "paged layout is int8-only (PagedInt8KVCache); use "
                    "kv_layout='dense' for the int4/K4V8 capacity tiers"
                )
            ps = self.cfg.page_size
            if self.cfg.max_seq_len % ps:
                raise ValueError("max_seq_len must be a multiple of page_size")
            # +1 per replica: each pool's last page is its reserved trash
            # page (writes through unmapped table entries land there).
            pages_local = (B // self._dp) * self.cfg.max_seq_len // ps + 1
            num_pages = self._dp * pages_local
            self._pages_local = pages_local
            mcfg = model.cfg
            # Under a mesh the pools hold ALL kv heads and shard over the
            # model axis (model.tp describes the per-shard view inside
            # shard_map); single-chip pools are pre-divided by model.tp.
            kv_heads = (
                mcfg.num_key_value_heads
                if mesh is not None
                else mcfg.num_key_value_heads // model.tp
            )
            self.caches = [
                PagedInt8KVCache.init(
                    B,
                    num_pages,
                    self.cfg.max_seq_len // ps,
                    ps,
                    kv_heads,
                    mcfg.head_dim,
                )
                for _ in range(mcfg.num_hidden_layers)
            ]
            # One free list per replica, each excluding its own trash page.
            self.allocators = [
                PageAllocator(pages_local - 1) for _ in range(self._dp)
            ]
            self.allocator = self.allocators[0]
            if self.cfg.prefix_cache:
                if draft_model is not None:
                    # The draft's dense cache can't adopt shared pages, so a
                    # skipped prefill would desynchronize draft and target.
                    raise ValueError("prefix_cache is incompatible with "
                                     "speculative mode (dense draft cache)")
                from .prefix_cache import PrefixCache

                # One prefix store per replica pool (dp>1): hits are only
                # possible within the replica that owns the pages, so a
                # shared prompt admitted to different replicas therefore
                # caches once per replica — correct, just fewer cross-hits.
                self.prefixes = [PrefixCache(a) for a in self.allocators]
                self.prefix = self.prefixes[0]
        elif kv_layout == "ring":
            # Ring-buffer sliding-window cache: O(window) device memory per
            # slot instead of O(max_seq) — the memory story for Mistral-class
            # windowed models at long max context (models/kv_cache.py::
            # RingInt8KVCache; exact vs the dense windowed cache).
            from ..models.kv_cache import RingInt8KVCache

            mcfg = model.cfg
            ring_window = self.cfg.stream_window or mcfg.sliding_window
            if ring_window <= 0:
                raise ValueError(
                    "kv_layout='ring' needs cfg.sliding_window>0 or "
                    "EngineConfig.stream_window>0 (StreamingLLM serving)"
                )
            if kv_dtype != jnp.int8:
                raise ValueError("ring layout is int8-only")
            # Prefill pieces are padded to power-of-2 buckets with floor 16
            # (_bucket), so the ring's slack must cover the PADDED chunk —
            # and, in tree mode, the candidate-tree width (the scoring
            # forward writes 1 + branches*gamma rows at the frontier).
            max_chunk = max(
                _bucket(self.cfg.prefill_chunk, self.cfg.prefill_chunk),
                gamma + 1,
                (1 + lookup_branches * max(gamma, 1)) if tree_mode else 0,
            )
            # Under a mesh the ring holds ALL kv heads and shards over the
            # model axis (cache_pspecs); single-chip rings are pre-divided.
            kv_heads = (
                mcfg.num_key_value_heads
                if mesh is not None
                else mcfg.num_key_value_heads // model.tp
            )
            # PER-LAYER HYBRID layout (round 5, VERDICT r4 item 6): models
            # with alternating/patterned windows (Gemma-2 every other
            # layer, Gemma-3 every Nth layer global) put ring buffers on
            # the SLIDING layers — O(window) memory where the model is
            # windowed — and dense int8 caches on the full-attention
            # layers, which genuinely need O(max_seq). The model's
            # per-layer window selection (models/llama.py DecoderLayer)
            # already routes each layer through whatever cache class it
            # holds, so no model change is needed. Uniform-window models
            # keep the all-ring list.
            pattern = mcfg.sliding_window_pattern or (
                2 if mcfg.alternating_sliding_window else 0
            )

            def _is_sliding(i: int) -> bool:
                return pattern == 0 or bool((i + 1) % pattern)

            from ..models.kv_cache import Int8KVCache

            self.caches = [
                RingInt8KVCache.init(
                    B, ring_window, max_chunk, kv_heads, mcfg.head_dim,
                    sinks=self.cfg.attention_sinks,
                )
                if _is_sliding(i)
                else Int8KVCache.init(
                    B, self.cfg.max_seq_len, kv_heads, mcfg.head_dim
                )
                for i in range(mcfg.num_hidden_layers)
            ]
            self.allocator = None
            self.allocators = None
        else:
            self.caches = init_cache(
                model.cfg, B, self.cfg.max_seq_len, kv_dtype=kv_dtype,
            )
            self.allocator = None
            self.allocators = None
        if mesh is not None:
            from jax.sharding import NamedSharding

            from ..parallel.shardings import cache_pspecs

            specs = cache_pspecs(self.caches)
            self.caches = jax.tree_util.tree_map(
                lambda a, sp: jax.device_put(a, NamedSharding(mesh, sp)),
                self.caches,
                specs,
            )
        # Speculative mode: the draft model keeps its own (dense) caches,
        # length-synchronized with the target's after every commit.
        self.draft_caches = (
            init_cache(
                draft_model.cfg, B, self.cfg.max_seq_len, kv_dtype=kv_dtype
            )
            if draft_model is not None
            else None
        )
        if eagle_draft is not None:
            # The draft layer's own KV cache (int8 like the target's by
            # default) + the per-slot TRUE-feature anchor (zeros until the
            # first scoring forward returns the real one) + the base
            # embedding table the draft conditions on.
            from ..models.eagle import _draft_cfg

            self.eagle_caches = init_cache(
                _draft_cfg(model.cfg), B, self.cfg.max_seq_len,
                kv_dtype=kv_dtype if kv_dtype in (jnp.int8,) else jnp.float32,
            )[0]
            self._eagle_feats = jnp.zeros(
                (B, model.cfg.hidden_size), jnp.float32
            )
            # Last hidden of each slot's most recent prefill chunk (the
            # cross-chunk feature carry + the post-prefill anchor).
            self._eagle_prev = jnp.zeros(
                (B, model.cfg.hidden_size), jnp.float32
            )
            self._emb_table = params.get("params", params)[
                "embed_tokens"]["embedding"]
            if mesh is not None:
                # The draft runs REPLICATED outside the mesh (like the
                # draft-model tier) — gather the possibly-sharded embedding
                # table onto every device once at init.
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as _P

                self._emb_table = jax.device_put(
                    self._emb_table, NamedSharding(mesh, _P())
                )
        else:
            self.eagle_caches = None
        spec_mode = (draft_model is not None or bool(prompt_lookup)
                     or medusa_heads is not None or eagle_draft is not None)
        penalties_on = (
            self.cfg.repetition_penalty != 1.0
            or self.cfg.presence_penalty != 0.0
            or self.cfg.frequency_penalty != 0.0
        )
        if penalties_on:
            # On-device occurrence counts over prompt + generated tokens.
            # Speculative modes (linear AND tree) penalize each window/tree
            # position with prefix/path-adjusted counts inside the scoring
            # program — streams exactly equal plain penalized decode.
            self.token_counts = jnp.zeros((B, model.cfg.vocab_size), jnp.int32)
        else:
            self.token_counts = None
        if getattr(model, "lora_stack", 0) > 0:
            # Per-slot adapter selection, threaded through every step
            # (speculative scoring forwards included).
            self.adapter_ids = jnp.zeros((B,), jnp.int32)
        else:
            self.adapter_ids = None
        # Per-slot sampling params (per-request overrides land here at
        # admission; one decode program serves every config — traced [B]
        # arrays, not static floats).
        self.samp = {
            "temps": jnp.full((B,), self.cfg.temperature, jnp.float32),
            "top_ks": jnp.full((B,), self.cfg.top_k, jnp.int32),
            "top_ps": jnp.full((B,), self.cfg.top_p, jnp.float32),
            "min_ps": jnp.full((B,), self.cfg.min_p, jnp.float32),
            "pres_pens": jnp.full(
                (B,), self.cfg.presence_penalty, jnp.float32),
            "freq_pens": jnp.full(
                (B,), self.cfg.frequency_penalty, jnp.float32),
        }
        self.last_tokens = jnp.zeros((B,), jnp.int32)
        # Medusa tree mode: next tick's proposals, produced by the PREVIOUS
        # tick's scoring forward (host copy — the engine edits rows on slot
        # turnover). [B, branches, gamma] int32.
        self._medusa_props = (
            np.zeros((B, lookup_branches, gamma), np.int32)
            if medusa_heads is not None
            else None
        )
        self.active = [False] * B
        self.slot_req: list[Optional[Request]] = [None] * B
        self.waiting: deque[Request] = deque()
        self.prefilling: deque[Request] = deque()
        self.finished: list[Request] = []
        self._cancel_pending: list[int] = []
        self._next_rid = 0
        self._key = jax.random.PRNGKey(self.cfg.seed)
        # Per-slot sampling keys (round 4, OpenAI per-request `seed`):
        # every random draw derives from fold(fold(slot_key, slot_step),
        # site) — slot_step counts THIS slot's decode ticks — so a seeded
        # request's sampled stream is REPRODUCIBLE regardless of batch
        # co-tenants, engine seed, dp sharding, or admission order, and an
        # unseeded request (key = fold(engine_key, rid)) is reproducible
        # for a fixed engine seed + rid. One consequence worth tests:
        # batched sampling now EXACTLY equals sequential sampling.
        self._slot_keys = jnp.zeros((B, 2), jnp.uint32)
        self._slot_steps = jnp.zeros((B,), jnp.int32)
        self.eos_id: Optional[int] = None
        self.debug_checks = debug_checks
        self.watchdog = StepWatchdog(step_budget_s)
        # Observability counters (SURVEY.md §5.5).
        self.stats = {
            "steps": 0,
            "tokens_generated": 0,
            "prefills": 0,
            "spec_proposed": 0,
            "spec_accepted": 0,
            "step_times": deque(maxlen=256),
            "prefill_times": deque(maxlen=256),
            "queue_waits": deque(maxlen=256),
        }

    # -- request API -------------------------------------------------------

    def add_request(
        self,
        prompt_tokens,
        max_new_tokens: int | None = None,
        eos_id: int | None = None,
        on_token=None,
        adapter_id: int = 0,
        stop_sequences=None,  # list of token-id lists (suffix match retires)
        min_new_tokens: int = 0,  # eos/stop ignored below this floor
        temperature: "float | None" = None,
        top_k: "int | None" = None,
        top_p: "float | None" = None,
        min_p: "float | None" = None,
        presence_penalty: "float | None" = None,  # OpenAI-style; needs the
        #   count buffer (any engine-level penalty config nonzero)
        frequency_penalty: "float | None" = None,
        priority: int = 0,  # scheduler="priority": higher admits first
        logit_mask_fn=None,  # guided decoding: fn(tokens_so_far)->[V] bool
        logit_bias=None,  # {token_id: delta} added pre-sampling each step
        logprobs: bool = False,  # per-request token logprobs (OpenAI style)
        top_logprobs: int = 0,  # k alternative (token, logprob) pairs/token
        seed: "int | None" = None,  # reproducible sampling for this request
    ) -> int:
        """Queue a request. ``eos_id`` stops decode on that token (falls back
        to the engine-wide eos_id); ``on_token(rid, tok)`` streams tokens.

        ``logit_mask_fn`` constrains generation (structured output): called
        on the host before every step with the request's tokens so far
        (prompt + generated), it returns a [vocab] bool mask of allowed
        next tokens; disallowed logits become -inf before sampling, so the
        constraint is exact at any temperature — and composes with every
        speculative mode (masks apply identically in proposal and
        acceptance scoring).

        ``logprobs=True`` records the target logprob of every emitted
        token on the request (pre-truncation convention) regardless of the
        engine-wide ``cfg.return_logprobs``.

        ``top_logprobs=k`` (1..cfg.max_top_logprobs) additionally records
        the k most-likely alternative (token_id, logprob) pairs per
        emitted position in Request.top_lps — OpenAI top_logprobs
        semantics, served from the same scoring forwards on every decode
        path (plain, linear speculation, trees). Implies ``logprobs``."""
        prompt = [int(t) for t in prompt_tokens]
        if not prompt:
            raise ValueError("empty prompt")
        if len(prompt) > self.cfg.max_seq_len:
            raise ValueError(
                f"prompt length {len(prompt)} > max_seq_len {self.cfg.max_seq_len}"
            )
        rid = self._next_rid
        self._next_rid += 1
        req = Request(
            rid=rid,
            prompt=prompt,
            max_new_tokens=(
                self.cfg.max_new_tokens if max_new_tokens is None else max_new_tokens
            ),
            eos_id=eos_id,
            on_token=on_token,
            adapter_id=adapter_id,
            stop_sequences=[
                [int(t) for t in seq] for seq in (stop_sequences or [])
            ],
            min_new_tokens=int(min_new_tokens),
            temperature=temperature,
            top_k=top_k,
            top_p=top_p,
            min_p=min_p,
            presence_penalty=presence_penalty,
            frequency_penalty=frequency_penalty,
            priority=priority,
            t_enqueue=time.perf_counter(),
            logit_mask_fn=logit_mask_fn,
            logit_bias=(
                {int(k): float(v) for k, v in logit_bias.items()}
                if logit_bias else None
            ),
            want_logprobs=bool(logprobs) or int(top_logprobs) > 0,
            top_logprobs=int(top_logprobs),
            seed=None if seed is None else int(seed),
        )
        if not 0 <= req.top_logprobs <= self.cfg.max_top_logprobs:
            raise ValueError(
                f"top_logprobs={req.top_logprobs} outside "
                f"[0, {self.cfg.max_top_logprobs}] "
                "(raise EngineConfig.max_top_logprobs to widen)"
            )
        if (presence_penalty or frequency_penalty) and self.token_counts is None:
            raise ValueError(
                "per-request presence/frequency penalties need the count "
                "buffer: set any of EngineConfig.repetition_penalty/"
                "presence_penalty/frequency_penalty nonzero at engine build"
            )
        if adapter_id and self.adapter_ids is None:
            raise ValueError(
                "adapter_id needs a multi-LoRA model (lora_stack > 0)"
            )
        if req.logit_bias:
            # Range-check HERE, not on the engine thread: a bad id raising
            # inside Engine.step() would kill serving for every client.
            V = self.model.cfg.vocab_size
            bad = [t for t in req.logit_bias if not 0 <= t < V]
            if bad:
                raise ValueError(
                    f"logit_bias token ids out of range [0, {V}): {bad[:5]}"
                )
        self.waiting.append(req)
        return rid

    def cancel(self, rid: int) -> bool:
        """Cancel a request by id, wherever it is in its lifecycle (queued,
        mid-prefill, or decoding). Safe to call from another thread (e.g. an
        HTTP handler): the cancellation is recorded here and applied at the
        start of the next engine tick, so it never races the device step.
        Tokens already generated stay in the request's output; the request
        retires with ``cancelled=True`` and its slot/KV pages free for the
        next tenant. Returns False for an unknown or already-finished rid."""
        live = any(r.rid == rid for r in self.waiting) or any(
            r is not None and r.rid == rid for r in self.slot_req
        )
        if not live:
            return False
        self._cancel_pending.append(rid)
        return True

    def _process_cancels(self):
        """Apply pending cancellations (tick-start, host state only)."""
        if not self._cancel_pending:
            return
        pending, self._cancel_pending = set(self._cancel_pending), []
        for req in [r for r in self.waiting if r.rid in pending]:
            self.waiting.remove(req)
            req.cancelled = True
            req.done = True
            self.finished.append(req)
        for slot in range(self.cfg.max_batch_size):
            req = self.slot_req[slot]
            if req is not None and req.rid in pending:
                req.cancelled = True
                self._retire_slot(slot)

    def has_work(self) -> bool:
        return bool(self.waiting) or bool(self.prefilling) or any(self.active)

    def _slot_allocator(self, slot: int):
        """The page allocator owning ``slot``'s replica pool (dp>1 shards
        both slots and pools over the data axis; page ids are replica-local)."""
        return self.allocators[slot // (self.cfg.max_batch_size // self._dp)]

    def _slot_prefix(self, slot: int):
        """The replica-local prefix store for ``slot`` (None if disabled)."""
        if self.prefix is None:
            return None
        return self.prefixes[slot // (self.cfg.max_batch_size // self._dp)]

    def _pick_next(self) -> Request:
        """Admission policy: which waiting request takes the freed slot.

        fcfs: arrival order. priority: highest effective tier first, where
        effective = Request.priority + seconds_waited/60 (aging — a tier-0
        request eventually outranks a steady stream of tier-1 arrivals,
        so no starvation), FIFO within a tier. sjf: shortest prompt first
        (fastest slot turnover under mixed lengths), FIFO tiebreak.
        Queue scan is O(waiting) per admission — negligible next to a
        device step."""
        if self.scheduler == "priority":
            now = time.perf_counter()
            return max(
                self.waiting,
                key=lambda r: (r.priority + (now - r.t_enqueue) / 60.0,
                               -r.t_enqueue),
            )
        if self.scheduler == "sjf":
            return min(self.waiting, key=lambda r: (len(r.prompt), r.t_enqueue))
        return self.waiting[0]

    def _paged_window_pages(self, needed_tokens: int) -> int:
        """Smallest power-of-2 page count whose window covers
        ``needed_tokens`` (+1 for the incoming decode write)."""
        full = self.caches[0].page_table.shape[1]
        ps = self.cfg.page_size
        w = 1
        while w * ps < needed_tokens + 1:
            w *= 2
        return min(w, full)

    # -- engine loop -------------------------------------------------------

    def _assign_slots(self):
        """Move waiting requests into free slots (and reserve their KV pages).

        Slot occupancy is ``slot_req[slot] is not None`` — a slot is held from
        assignment through retirement, including the ticks it spends
        mid-prefill (``active`` only flips once the prompt is fully in KV)."""
        for slot in range(self.cfg.max_batch_size):
            if self.slot_req[slot] is not None or not self.waiting:
                continue
            req = self._pick_next()
            if self.allocator is not None:
                # Reserve exactly the pages this request can touch.
                ps = self.cfg.page_size
                budget = min(
                    len(req.prompt) + req.max_new_tokens, self.cfg.max_seq_len
                )
                need = -(-budget // ps)
                matched_tokens = 0
                pfx = self._slot_prefix(slot)
                if pfx is not None:
                    # Adopt the longest resident prefix chain; prefill only
                    # the tail (engine/prefix_cache.py invariants).
                    req.shared_pages, matched_tokens = pfx.match(
                        req.prompt, ps
                    )
                    need -= len(req.shared_pages)
                    pages = pfx.alloc(need)
                else:
                    pages = self._slot_allocator(slot).alloc(need)
                if pages is None:
                    if pfx is not None and req.shared_pages:
                        pfx.unref(req.shared_pages)
                        req.shared_pages = []
                    break  # pool exhausted; retry after something finishes
                req.pages = pages
                req.prefill_off = matched_tokens
                if pfx is not None:
                    pfx.hit_tokens += matched_tokens
                chain = req.shared_pages + pages
                self.caches = [
                    c.map_slot(slot, chain, start_len=matched_tokens)
                    for c in self.caches
                ]
            self.waiting.remove(req)
            req.slot = slot
            req.t_admit = time.perf_counter()
            self.stats["queue_waits"].append(req.t_admit - req.t_enqueue)
            self.slot_req[slot] = req
            self.prefilling.append(req)
            if self.adapter_ids is not None:
                self.adapter_ids = self.adapter_ids.at[slot].set(
                    req.adapter_id
                )
            c = self.cfg
            eff = (
                ("temps", req.temperature, c.temperature, jnp.float32),
                ("top_ks", req.top_k, c.top_k, jnp.int32),
                ("top_ps", req.top_p, c.top_p, jnp.float32),
                ("min_ps", req.min_p, c.min_p, jnp.float32),
                ("pres_pens", req.presence_penalty, c.presence_penalty,
                 jnp.float32),
                ("freq_pens", req.frequency_penalty, c.frequency_penalty,
                 jnp.float32),
            )
            for name, override, default, dt in eff:
                v = default if override is None else override
                self.samp[name] = self.samp[name].at[slot].set(
                    jnp.asarray(v, dt)
                )
            base = (
                jax.random.PRNGKey(req.seed) if req.seed is not None
                else jax.random.fold_in(
                    jax.random.PRNGKey(self.cfg.seed), req.rid
                )
            )
            self._slot_keys = self._slot_keys.at[slot].set(
                jnp.asarray(base, jnp.uint32)
            )
            self._slot_steps = self._slot_steps.at[slot].set(0)
            if self.token_counts is not None:
                import numpy as _np

                row = _np.bincount(
                    _np.asarray(req.prompt),
                    minlength=self.model.cfg.vocab_size,
                ).astype(_np.int32)
                self.token_counts = self.token_counts.at[slot].set(
                    jnp.asarray(row)
                )

    def _tick_keys(self, site: int):
        """Per-slot draw keys [B, 2] for one sampling site of the current
        tick: fold(fold(slot_key, slot_step), site). Sites: 0 plain decode,
        1 prefill first token, 2 draft proposal, 3 accept, 4 tree."""
        return jax.vmap(
            lambda k, st: jax.random.fold_in(jax.random.fold_in(k, st), site)
        )(self._slot_keys, self._slot_steps)

    def _bump_slot_steps(self, active):
        self._slot_steps = self._slot_steps + active.astype(jnp.int32)

    def _want_logprobs(self) -> bool:
        """Engine-wide config OR any live request's per-request opt-in."""
        if self.cfg.return_logprobs:
            return True
        return any(
            r is not None and r.want_logprobs for r in self.slot_req
        ) or any(r.want_logprobs for r in self.waiting) or any(
            r.want_logprobs for r in self.prefilling
        )

    def _want_top_lp(self) -> int:
        """Compile-time top-k width for this tick: cfg.max_top_logprobs when
        ANY live request wants alternatives, else 0. One fixed width keeps
        the program count at 2 per decode path; each request's own k is a
        host-side slice at commit."""
        want = any(
            r is not None and r.top_logprobs > 0 for r in self.slot_req
        ) or any(r.top_logprobs > 0 for r in self.waiting) or any(
            r.top_logprobs > 0 for r in self.prefilling
        )
        return self.cfg.max_top_logprobs if want else 0

    @staticmethod
    def _slice_top_lp(vals_row, idx_row, k: int):
        """[K] device rows -> k-entry [(token_id, logprob), ...] host list."""
        return [
            (int(idx_row[j]), float(vals_row[j])) for j in range(k)
        ]

    def _prefill_tick(self):
        """Run ONE prefill chunk of the oldest mid-prefill request.

        This is the interleaving contract (SURVEY.md §5.7): a long prompt
        streams through in prefill_chunk pieces across consecutive ticks,
        so slots that are already decoding emit a token between every pair of
        chunks — their inter-token gap is bounded by one chunk, not by the
        whole prompt."""
        req = self.prefilling[0]
        slot = req.slot
        chunk = self.cfg.prefill_chunk
        piece = req.prompt[req.prefill_off : req.prefill_off + chunk]
        tpad = _bucket(len(piece), chunk)
        tokens = jnp.asarray([piece + [0] * (tpad - len(piece))], jnp.int32)
        # Assigned slots start at lengths==0 (init/reset_slot), so the first
        # chunk is just an extend from position 0 — one jitted program per
        # bucket, not two.
        extend = (
            self._tp_fns["extend"] if self._tp_fns is not None
            else partial(_extend_slot, self.model)
        )
        aid = (
            jnp.asarray([req.adapter_id], jnp.int32)
            if self.adapter_ids is not None
            else None
        )
        if self.eagle_caches is not None:
            # EAGLE: the base chunk forward also returns hidden states, and
            # the feature draft prefills its own cache on (hidden[p-1],
            # emb(token[p])) pairs so decode-time drafting attends over the
            # whole prompt in feature space.
            extend_h = (
                self._tp_fns["extend_hidden"] if self._tp_fns is not None
                else partial(_extend_slot_hidden, self.model)
            )
            req.last_logits, h_chunk, self.caches = extend_h(
                self.params, self.caches, tokens,
                jnp.asarray(len(piece), jnp.int32),
                jnp.asarray(slot, jnp.int32),
                aid,
            )
            prev = self._eagle_prev[slot]  # last hidden of the PREV chunk
            f_in = jnp.concatenate(
                [prev[None, None, :], h_chunk[:, :-1]], axis=1
            )
            self.eagle_caches = _eagle_extend_slot(
                self.eagle_draft, self.eagle_params, self.eagle_caches,
                f_in, self._emb_table[tokens],
                jnp.asarray(len(piece), jnp.int32),
                jnp.asarray(slot, jnp.int32),
            )
            self._eagle_prev = self._eagle_prev.at[slot].set(
                h_chunk[0, len(piece) - 1]
            )
        else:
            req.last_logits, self.caches = extend(
                self.params,
                self.caches,
                tokens,
                jnp.asarray(len(piece), jnp.int32),
                jnp.asarray(slot, jnp.int32),
                aid,
            )
        if self.draft_caches is not None:
            # Speculative mode: the draft cache tracks the same prompt.
            _, self.draft_caches = _extend_slot(
                self.draft_model,
                self.draft_params,
                self.draft_caches,
                tokens,
                jnp.asarray(len(piece), jnp.int32),
                jnp.asarray(slot, jnp.int32),
                None,
            )
        req.prefill_off += len(piece)
        if req.prefill_off < len(req.prompt):
            return  # more chunks next tick; decoding slots proceed meanwhile

        # Prompt fully in KV: emit the first token and activate the slot.
        self.prefilling.popleft()
        if self.eagle_caches is not None:
            # Anchor the feature draft on the state that predicts the first
            # generated token.
            self._eagle_feats = self._eagle_feats.at[req.slot].set(
                self._eagle_prev[req.slot]
            )
        if self.prefix is not None:
            # Publish this prompt's full pages for future prefix hits
            # (into the owning replica's store).
            req.held_pages = self._slot_prefix(req.slot).publish(
                req.prompt,
                req.shared_pages + req.pages,
                self.cfg.page_size,
                len(req.shared_pages),
            )
        if req.max_new_tokens > 0:
            # Site 1, step 0 of this slot's key chain (the first generated
            # token precedes any decode tick).
            sub = jax.random.fold_in(
                jax.random.fold_in(self._slot_keys[req.slot], 0), 1
            )[None]
            counts_row = (
                self.token_counts[req.slot][None]
                if self.token_counts is not None
                else None
            )
            from .sampling import sample_batched

            last_logits = req.last_logits
            if req.logit_mask_fn is not None:
                # The first generated token obeys the constraint too.
                allow = jnp.asarray(
                    np.asarray(req.logit_mask_fn(req.prompt), bool)
                )
                last_logits = jnp.where(allow, last_logits, NEG_INF_LOGIT)
            if req.logit_bias:
                row = np.zeros(self.model.cfg.vocab_size, np.float32)
                for t, v in req.logit_bias.items():
                    row[t] += v
                last_logits = last_logits + jnp.asarray(row)
            first_tok = int(
                sample_batched(
                    last_logits[None, :],
                    sub,
                    self.samp["temps"][req.slot][None],
                    self.samp["top_ks"][req.slot][None],
                    self.samp["top_ps"][req.slot][None],
                    self.samp["min_ps"][req.slot][None],
                    counts_row,
                    self.cfg.repetition_penalty,
                    pres=self.samp["pres_pens"][req.slot][None],
                    freq=self.samp["freq_pens"][req.slot][None],
                )[0]
            )
            if self.cfg.return_logprobs or req.want_logprobs:
                from .sampling import token_logprob

                req.logprobs.append(
                    float(
                        token_logprob(
                            last_logits[None, :],
                            jnp.asarray([first_tok], jnp.int32),
                        )[0]
                    )
                )
            if req.top_logprobs > 0:
                from .sampling import top_logprobs as _top_lp

                vals, idx = jax.device_get(
                    _top_lp(last_logits[None, :], req.top_logprobs)
                )
                req.top_lps.append(self._slice_top_lp(
                    vals[0], idx[0], req.top_logprobs
                ))
            if self.token_counts is not None:
                self.token_counts = self.token_counts.at[
                    req.slot, first_tok
                ].add(1)
            req.out.append(first_tok)
            self.stats["tokens_generated"] += 1
            if req.on_token is not None:
                req.on_token(req.rid, first_tok)
            self.last_tokens = self.last_tokens.at[req.slot].set(first_tok)
        req.last_logits = None
        self.active[req.slot] = True
        self.stats["prefills"] += 1
        self._maybe_finish(req.slot)
        self.stats["prefill_times"].append(time.perf_counter() - req.t_admit)

    def _maybe_finish(self, slot: int):
        req = self.slot_req[slot]
        if req is None:
            return
        tok = req.out[-1] if req.out else None
        total_len = len(req.prompt) + len(req.out)
        eos = req.eos_id if req.eos_id is not None else self.eos_id
        stopped = any(
            len(req.out) >= len(seq) and req.out[-len(seq):] == seq
            for seq in req.stop_sequences
        )
        if len(req.out) < req.min_new_tokens:
            # min_new_tokens: eos/stop-sequences don't retire the request
            # before the floor (the tokens still stream; OpenAI min_tokens
            # semantics). Hard limits below still apply.
            stopped = False
            if eos is not None and tok == eos:
                tok = None
        if (
            len(req.out) >= req.max_new_tokens
            or (eos is not None and tok == eos)
            or stopped
            or total_len >= self.cfg.max_seq_len
        ):
            self._retire_slot(slot)

    def _retire_slot(self, slot: int):
        """Retire the slot's request: mark done, free the slot's cache
        length / KV pages / any mid-prefill queue entry for the next tenant."""
        req = self.slot_req[slot]
        req.done = True
        self.finished.append(req)
        self.active[slot] = False
        self.slot_req[slot] = None
        if self.token_counts is not None:
            self.token_counts = self.token_counts.at[slot].set(0)
        if self.adapter_ids is not None:
            self.adapter_ids = self.adapter_ids.at[slot].set(0)
        if self._medusa_props is not None:
            # Next tenant's first tree tick proposes nothing (zeros are
            # harmless: greedy acceptance only commits matches).
            self._medusa_props[slot] = 0
        if req in self.prefilling:
            self.prefilling.remove(req)
        # Free the slot: reset its cache length for the next tenant.
        self.caches = [c.reset_slot(jnp.asarray(slot)) for c in self.caches]
        if self.draft_caches is not None:
            self.draft_caches = [
                c.reset_slot(jnp.asarray(slot)) for c in self.draft_caches
            ]
        if self.eagle_caches is not None:
            self.eagle_caches = self.eagle_caches.reset_slot(
                jnp.asarray(slot)
            )
            self._eagle_feats = self._eagle_feats.at[slot].set(0.0)
            self._eagle_prev = self._eagle_prev.at[slot].set(0.0)
        if self.allocator is not None:
            if self.prefix is not None:
                # Drop references on shared/published pages (zero-ref pages
                # stay cached for future prefix hits); free private pages
                # (decode tail, partial prompt page, publication-race losers).
                held = req.held_pages or list(req.shared_pages)
                held_set = set(held)
                self._slot_prefix(slot).unref(held)
                self._slot_allocator(slot).free(
                    [p for p in req.pages if p not in held_set])
            elif req.pages:
                self._slot_allocator(slot).free(req.pages)
            req.pages, req.shared_pages, req.held_pages = [], [], []

    def _assemble_logit_bias(self):
        """This tick's [B, V] f32 pre-sampling additive bias, or None when
        no active slot is constrained. Guided masks contribute -1e30 on
        disallowed tokens (the grammar/FSM state lives in each request's
        host callable); logit_bias dicts contribute their deltas; both
        compose per slot."""
        slots = [
            (s, r) for s, r in enumerate(self.slot_req)
            if r is not None and self.active[s]
            and (r.logit_mask_fn is not None or r.logit_bias)
        ]
        if not slots:
            return None
        bias = np.zeros(
            (self.cfg.max_batch_size, self.model.cfg.vocab_size), np.float32
        )
        for s, r in slots:
            if r.logit_mask_fn is not None:
                # Static masks (e.g. HTTP allowed_tokens) carry a
                # precomputed row on the callable; stateful FSMs
                # re-evaluate per tick (their state is the point).
                row = getattr(r.logit_mask_fn, "static_row", None)
                if row is None:
                    allow = np.asarray(
                        r.logit_mask_fn(r.prompt + r.out), bool
                    )
                    row = np.where(allow, 0.0, NEG_INF_LOGIT)
                bias[s] = row
            if r.logit_bias:
                if r._bias_row is None:
                    r._bias_row = np.zeros(
                        self.model.cfg.vocab_size, np.float32
                    )
                    for t, v in r.logit_bias.items():
                        r._bias_row[t] += v
                bias[s] += r._bias_row
        return jnp.asarray(bias)

    def _assemble_window_bias(self, paths):
        """Per-position guided bias for a speculative window: [B, T, V] f32
        (None when no active slot is constrained). ``paths[slot]`` is the
        list of T host-known proposal prefixes (tokens appended after the
        slot's committed stream): window position t's logits predict the
        token AFTER ``committed + paths[slot][t]``, so a stateful mask fn is
        re-evaluated at that FSM state — acceptance then scores every
        proposal against the exact distribution plain masked decoding would
        have used at that position. Static masks (``static_row``) and
        logit_bias dicts are position-independent and broadcast."""
        slots = [
            (s, r) for s, r in enumerate(self.slot_req)
            if r is not None and self.active[s]
            and (r.logit_mask_fn is not None or r.logit_bias)
        ]
        if not slots:
            return None
        B = self.cfg.max_batch_size
        V = self.model.cfg.vocab_size
        T = len(next(iter(paths.values())))
        bias = np.zeros((B, T, V), np.float32)
        for s, r in slots:
            if r.logit_mask_fn is not None:
                row = getattr(r.logit_mask_fn, "static_row", None)
                if row is not None:
                    bias[s] += np.asarray(row, np.float32)[None, :]
                else:
                    hist = r.prompt + r.out
                    for t, pref in enumerate(paths[s]):
                        allow = np.asarray(
                            r.logit_mask_fn(hist + list(pref)), bool
                        )
                        bias[s, t] += np.where(allow, 0.0, NEG_INF_LOGIT)
            if r.logit_bias:
                if r._bias_row is None:
                    r._bias_row = np.zeros(V, np.float32)
                    for t_, v in r.logit_bias.items():
                        r._bias_row[t_] += v
                bias[s] += r._bias_row[None, :]
        return jnp.asarray(bias)

    def _has_stateful_mask(self) -> bool:
        """True when an ACTIVE slot carries a guided mask without a
        precomputed static row (an FSM whose allowed set depends on the
        decoded path — the case that needs host-side proposal prefixes)."""
        return any(
            r is not None and self.active[s] and r.logit_mask_fn is not None
            and getattr(r.logit_mask_fn, "static_row", None) is None
            for s, r in enumerate(self.slot_req)
        )

    def step(self):
        """One engine tick: assign slots, run at most ONE prefill chunk, then
        one batched decode for every active slot. Prefill work and decode
        interleave tick-by-tick, so admitting a long prompt never stalls the
        running requests for more than one chunk."""
        t0 = time.perf_counter()
        self._process_cancels()
        self._assign_slots()
        if self.prefilling:
            self._prefill_tick()
        if not any(self.active):
            return
        if self.draft_caches is not None:
            self._spec_decode_tick(t0)
            return
        if self.eagle_caches is not None:
            if self.lookup_branches > 1:
                self._eagle_tree_tick(t0)
            else:
                self._eagle_tick(t0)
            return
        if self.medusa_params is not None:
            self._tree_medusa_tick(t0)
            return
        if self.prompt_lookup:
            if self.lookup_branches > 1:
                self._tree_lookup_tick(t0)
            else:
                self._prompt_lookup_tick(t0)
            return
        active = jnp.asarray(self.active)
        sub = self._tick_keys(0)
        self._bump_slot_steps(active)
        decode = (
            self._tp_fns["decode"] if self._tp_fns is not None
            else partial(_decode_step, self.model)
        )
        # Paged layout: slice the page table to the power-of-2 page bucket
        # covering the longest ACTIVE context (host-known), so the gathered
        # attention window scales with live occupancy instead of max_seq —
        # the XLA-backend gather then reads O(active window) HBM bytes per
        # step. Mid-prefill slots don't constrain the bucket: their decode
        # writes are garbage that the next chunk overwrites (trash-page if
        # out-of-window), and their attention output is discarded. One decode
        # program compiles per bucket (log2(max_pages) total). Restoring the
        # full-width table afterwards is safe: the device step never edits
        # the table, and the sliced copies — not the originals — were donated.
        caches, restore_tables = self.caches, None
        if self.kv_layout == "paged" and self.mesh is None:
            needed = max(
                (
                    len(r.prompt) + len(r.out)
                    for r in self.slot_req
                    if r is not None and self.active[r.slot]
                ),
                default=0,
            )
            W = self._paged_window_pages(needed)
            if W < self.caches[0].page_table.shape[1]:
                restore_tables = [c.page_table for c in self.caches]
                caches = [
                    dataclasses.replace(c, page_table=c.page_table[:, :W])
                    for c in self.caches
                ]
        logit_bias = self._assemble_logit_bias()
        top_lp = self._want_top_lp()
        next_tokens, logprobs, tl, new_counts, self.caches = decode(
            self.params,
            caches,
            self.last_tokens,
            active,
            sub,
            self.samp,
            penalty=self.cfg.repetition_penalty,
            counts=self.token_counts,
            adapter_ids=self.adapter_ids,
            logit_bias=logit_bias,
            top_lp=top_lp,
        )
        if new_counts is not None:
            self.token_counts = new_counts
        if restore_tables is not None:
            self.caches = [
                dataclasses.replace(c, page_table=t)
                for c, t in zip(self.caches, restore_tables)
            ]
        self.last_tokens = next_tokens
        if self.debug_checks:
            check_finite("decode next_tokens", next_tokens)
            check_finite("kv lengths", self.caches[0].lengths)
            check_finite("kv values", _cache_probe(self.caches[0]))
        toks = jax.device_get(next_tokens)
        lps = (
            jax.device_get(logprobs) if self._want_logprobs() else None
        )
        tl_h = jax.device_get(tl) if tl is not None else None
        for slot in range(self.cfg.max_batch_size):
            if not self.active[slot]:
                continue
            req = self.slot_req[slot]
            req.out.append(int(toks[slot]))
            if lps is not None and (self.cfg.return_logprobs
                                    or req.want_logprobs):
                req.logprobs.append(float(lps[slot]))
            if tl_h is not None and req.top_logprobs > 0:
                req.top_lps.append(self._slice_top_lp(
                    tl_h[0][slot], tl_h[1][slot], req.top_logprobs
                ))
            if req.on_token is not None:
                req.on_token(req.rid, int(toks[slot]))
            self.stats["tokens_generated"] += 1
            self._maybe_finish(slot)
        self.stats["steps"] += 1
        dt = time.perf_counter() - t0
        self.stats["step_times"].append(dt)
        self.watchdog.observe(dt)

    def _spec_decode_tick(self, t0: float):
        """Speculative decode tick: the draft model proposes gamma tokens per
        slot, the target scores every window in ONE batched forward, and each
        active slot commits its accepted prefix + 1 corrected token — i.e.
        1..gamma+1 tokens per tick per slot at one target forward per tick.
        Greedy acceptance makes the stream exactly equal to plain greedy
        decoding (engine-level test)."""
        import dataclasses

        active = jnp.asarray(self.active)
        k_draft = self._tick_keys(2)
        k_accept = self._tick_keys(3)
        self._bump_slot_steps(active)
        bias0 = self._assemble_logit_bias()  # [B, V] guided bias (or None)
        proposals, draft_logits, self.draft_caches = _draft_propose(
            self.draft_model,
            self.draft_params,
            self.draft_caches,
            self.last_tokens,
            active,
            k_draft,
            self.samp,
            self._gamma_cur,
            bias=bias0,
        )
        window = jnp.concatenate([self.last_tokens[:, None], proposals], axis=1)
        wbias = None
        if bias0 is not None:
            g = self._gamma_cur
            if self._has_stateful_mask():
                # Stateful FSM masks need the proposal prefixes host-side
                # (one device_get; only paid when such a request is active).
                props_h = np.asarray(jax.device_get(proposals))
                paths = {
                    s: [list(props_h[s, :t]) for t in range(g + 1)]
                    for s in range(self.cfg.max_batch_size)
                }
            else:
                paths = {
                    s: [[]] * (g + 1)
                    for s in range(self.cfg.max_batch_size)
                }
            wbias = self._assemble_window_bias(paths)
        score = (
            self._tp_fns["spec_score"] if self._tp_fns is not None
            else partial(_spec_score_and_accept, self.model)
        )
        wl = self._want_logprobs()
        out = score(
            self.params, self.caches, window, active, k_accept, self.samp,
            draft_logits, wbias, want_logprobs=wl,
            counts=self.token_counts, penalty=self.cfg.repetition_penalty,
            adapter_ids=self.adapter_ids, top_lp=self._want_top_lp(),
        )
        if wl:
            corrections, accepted, lp, self.caches = out
        else:
            (corrections, accepted, self.caches), lp = out, None
        # Draft caches rewind to the committed frontier (pools beyond are
        # masked by length and overwritten by the next window). Each layer
        # gets its OWN copy: sharing the target's lengths buffer would let a
        # later donated target step delete it out from under the draft.
        committed = self.caches[0].lengths
        self.draft_caches = [
            dataclasses.replace(c, lengths=committed + 0)
            for c in self.draft_caches
        ]

        self._commit_spec_results(window, corrections, accepted, t0,
                                  logprobs=lp)

    def _eagle_tick(self, t0: float):
        """EAGLE speculative tick: the one-layer feature draft proposes
        gamma tokens per slot (autoregressive over its own KV cache,
        anchored on the true base feature at each slot's frontier), the
        target scores every window in ONE forward that also returns the
        hidden states, and the commit re-anchors the feature + rewinds the
        draft cache to the committed frontier. Acceptance is the SAME
        rejection-sampling program as draft-model speculation — exact
        greedy, distribution-exact sampling."""
        import dataclasses

        active = jnp.asarray(self.active)
        k_draft = self._tick_keys(2)
        k_accept = self._tick_keys(3)
        self._bump_slot_steps(active)
        bias0 = self._assemble_logit_bias()
        proposals, draft_logits, self.eagle_caches = _eagle_propose(
            self.eagle_draft, self.eagle_params, self.eagle_caches,
            self._eagle_feats, self.last_tokens, self._emb_table, active,
            k_draft, self.samp, self._gamma_cur, bias=bias0,
        )
        window = jnp.concatenate(
            [self.last_tokens[:, None], proposals], axis=1
        )
        wbias = None
        if bias0 is not None:
            g = self._gamma_cur
            if self._has_stateful_mask():
                props_h = np.asarray(jax.device_get(proposals))
                paths = {
                    s: [list(props_h[s, :t]) for t in range(g + 1)]
                    for s in range(self.cfg.max_batch_size)
                }
            else:
                paths = {
                    s: [[]] * (g + 1)
                    for s in range(self.cfg.max_batch_size)
                }
            wbias = self._assemble_window_bias(paths)
        score = (
            self._tp_fns["spec_score_hidden"] if self._tp_fns is not None
            else partial(_spec_score_and_accept_hidden, self.model)
        )
        wl = self._want_logprobs()
        out = score(
            self.params, self.caches, window, active, k_accept, self.samp,
            draft_logits, wbias, want_logprobs=wl,
            counts=self.token_counts, penalty=self.cfg.repetition_penalty,
            adapter_ids=self.adapter_ids, top_lp=self._want_top_lp(),
        )
        if wl:
            corrections, accepted, h_next, lp, self.caches = out
        else:
            (corrections, accepted, h_next, self.caches), lp = out, None
        self._eagle_feats = h_next
        committed = self.caches[0].lengths
        self.eagle_caches = dataclasses.replace(
            self.eagle_caches, lengths=committed + 0
        )
        self._commit_spec_results(window, corrections, accepted, t0,
                                  logprobs=lp)

    def _eagle_tree_tick(self, t0: float):
        """EAGLE-tree tick (lookup_branches > 1 with an eagle draft —
        VERDICT r4 item 2): the feature draft's step-1 top-J candidates
        each continue greedily to depth gamma (branch state = J transient
        copies of the one-layer draft cache), the target scores the whole
        candidate tree in ONE forward (ancestor mask + branch compaction,
        the same program as lookup/medusa trees) and also returns the
        re-anchor hidden; the winning branch's draft-cache copy becomes
        the persistent draft cache. Exact greedy / distribution-exact
        sampling, like every other speculative tier."""
        import dataclasses

        active = jnp.asarray(self.active)
        self._bump_slot_steps(active)
        B = self.cfg.max_batch_size
        J, d = self.lookup_branches, self._gamma_cur
        props, cache_rep = _eagle_propose_tree(
            self.eagle_draft, self.eagle_params, self.eagle_caches,
            self._eagle_feats, self.last_tokens, self._emb_table, active,
            branches=J, depth=d,
        )
        props_h = np.asarray(jax.device_get(props))
        window = jnp.concatenate(
            [self.last_tokens[:, None], props.reshape(B, J * d)], axis=1
        )
        k_accept = self._tick_keys(4)
        bias = self._assemble_window_bias(self._tree_paths(props_h, J, d))
        score = (
            self._tp_fns["tree_score_hidden"] if self._tp_fns is not None
            else partial(_tree_score_and_accept_hidden, self.model)
        )
        wl = self._want_logprobs()
        out = score(
            self.params, self.caches, window, active, k_accept, self.samp,
            branches=J, depth=d, bias=bias, counts=self.token_counts,
            penalty=self.cfg.repetition_penalty, want_logprobs=wl,
            adapter_ids=self.adapter_ids, top_lp=self._want_top_lp(),
        )
        if wl:
            best, accepted, corrections, h_corr, lp, self.caches = out
        else:
            (best, accepted, corrections, h_corr, self.caches), lp = (
                out, None,
            )
        # Re-anchor on the true base feature at the last accepted node,
        # adopt the winning branch's draft cache, rewind to the committed
        # frontier (rows past it are masked and overwritten next tick).
        self._eagle_feats = h_corr
        committed = self.caches[0].lengths
        self.eagle_caches = dataclasses.replace(
            _eagle_tree_select(cache_rep, best, J), lengths=committed + 0
        )
        self._commit_tree_results(props_h, best, accepted, corrections, d,
                                  t0, logprobs=lp)

    def _tree_lookup_tick(self, t0: float):
        """Tree-speculation tick (lookup_branches > 1): each active slot
        proposes up to J distinct n-gram continuations; the target scores
        the whole candidate tree in ONE forward (ancestor mask), the
        accepted branch commits — its K/V rows compact into chain order so
        the cache is indistinguishable from sequential decode. Greedy rows
        reproduce the plain greedy stream exactly; sampled rows are
        distribution-identical to plain sampling (both tested)."""
        import numpy as _np

        active = jnp.asarray(self.active)
        B = self.cfg.max_batch_size
        J, d = self.lookup_branches, self._gamma_cur
        props = _np.zeros((B, J, d), _np.int32)
        for slot in range(B):
            req = self.slot_req[slot]
            if not self.active[slot] or req is None:
                continue
            props[slot] = _ngram_propose_branches(
                req.prompt + req.out, self.prompt_lookup, d, J
            )
        window = jnp.concatenate(
            [self.last_tokens[:, None], jnp.asarray(props).reshape(B, J * d)],
            axis=1,
        )
        score = (
            self._tp_fns["tree_score"] if self._tp_fns is not None
            else partial(_tree_score_and_accept, self.model)
        )
        k_accept = self._tick_keys(4)
        self._bump_slot_steps(active)
        bias = self._assemble_window_bias(self._tree_paths(props, J, d))
        wl = self._want_logprobs()
        out = score(
            self.params, self.caches, window, active, k_accept, self.samp,
            branches=J, depth=d, bias=bias, counts=self.token_counts,
            penalty=self.cfg.repetition_penalty, want_logprobs=wl,
            adapter_ids=self.adapter_ids, top_lp=self._want_top_lp(),
        )
        if wl:
            best, accepted, corrections, lp, self.caches = out
        else:
            (best, accepted, corrections, self.caches), lp = out, None
        self._commit_tree_results(props, best, accepted, corrections, d, t0,
                                  logprobs=lp)

    def _tree_paths(self, props, J: int, d: int):
        """Per-node proposal prefixes for _assemble_window_bias: node 0 is
        the committed frontier (empty prefix); branch b's node at depth k
        conditions on that branch's first k+1 proposals."""
        return {
            s: [[]] + [
                [int(t) for t in props[s, b, : k + 1]]
                for b in range(J) for k in range(d)
            ]
            for s in range(self.cfg.max_batch_size)
        }

    def _tree_medusa_tick(self, t0: float):
        """Trained-drafting-heads tree tick (medusa_params set): candidates
        come from the PREVIOUS tick's scoring forward (heads on the hidden
        state at each slot's last accepted node — models/medusa.py), and
        this tick's forward emits the next proposals in the same program.
        Freshly admitted slots propose zeros for exactly one tick (merely a
        short tick, never a wrong one: greedy rows only commit matches and
        sampled rows stay exact under ANY proposals)."""
        active = jnp.asarray(self.active)
        B = self.cfg.max_batch_size
        J, d = self.lookup_branches, self._gamma_cur
        # Under adaptive depth the stored proposals (produced at the
        # PREVIOUS tick's depth) may be wider or narrower than this tick's:
        # slice down / zero-pad up (zeros are harmless proposals).
        stored = self._medusa_props
        props = np.zeros((B, J, d), np.int32)
        w = min(d, stored.shape[2])
        props[:, :, :w] = stored[:, :, :w]
        window = jnp.concatenate(
            [self.last_tokens[:, None], jnp.asarray(props).reshape(B, J * d)],
            axis=1,
        )
        k_accept = self._tick_keys(4)
        self._bump_slot_steps(active)
        bias = self._assemble_window_bias(self._tree_paths(props, J, d))
        wl = self._want_logprobs()
        extra = dict(
            counts=self.token_counts,
            penalty=self.cfg.repetition_penalty, want_logprobs=wl,
            adapter_ids=self.adapter_ids, top_lp=self._want_top_lp(),
        )
        if self._tp_fns is not None:
            score = partial(
                self._tp_fns["tree_score_heads"],
                heads=self.medusa_heads, head_params=self.medusa_params,
            )
            out = score(
                self.params, self.caches, window, active, k_accept,
                self.samp, branches=J, depth=d, bias=bias, **extra,
            )
        else:
            out = _tree_score_and_accept_heads(
                self.model, self.medusa_heads, self.params, self.caches,
                self.medusa_params, window, active, k_accept, self.samp,
                branches=J, depth=d, bias=bias, **extra,
            )
        if wl:
            best, accepted, corrections, next_props, lp, self.caches = out
        else:
            (best, accepted, corrections, next_props, self.caches), lp = (
                out, None,
            )
        # Publish next proposals BEFORE committing: _retire_slot zeroes the
        # rows of any slot that finishes during emission.
        self._medusa_props = np.array(jax.device_get(next_props))
        self._commit_tree_results(props, best, accepted, corrections, d, t0,
                                  logprobs=lp)

    def _commit_tree_results(self, props, best, accepted, corrections,
                             d: int, t0: float, logprobs=None):
        """Shared tail of the tree-speculation tick flavors: emit each
        active slot's accepted branch prefix + 1 correction token.
        ``logprobs``: optional (lp_path [B, d], lp_corr [B]) target
        logprobs along the winning branch (cfg.return_logprobs) — extended
        with winning-branch top-k alternatives (vals/idx [B, d, K] at the
        parent nodes, vals/idx [B, K] at the correction node) when any
        request asked for top_logprobs."""
        import numpy as _np

        best_h = jax.device_get(best)
        accepted_h = jax.device_get(accepted)
        corr_h = jax.device_get(corrections)
        lp_h = jax.device_get(logprobs) if logprobs is not None else None
        new_last = _np.array(jax.device_get(self.last_tokens))
        tick_prop = tick_acc = 0
        for slot in range(self.cfg.max_batch_size):
            if not self.active[slot]:
                continue
            req = self.slot_req[slot]
            a = int(accepted_h[slot])
            tick_prop += d
            tick_acc += a
            emitted = [int(t) for t in props[slot, int(best_h[slot]), :a]]
            emitted.append(int(corr_h[slot]))
            lps = None
            if lp_h is not None and (self.cfg.return_logprobs
                                     or req.want_logprobs):
                lps = [float(lp_h[0][slot, t]) for t in range(a)]
                lps.append(float(lp_h[1][slot]))
            tlps = None
            if lp_h is not None and len(lp_h) > 2 and req.top_logprobs > 0:
                k = req.top_logprobs
                tlps = [
                    self._slice_top_lp(
                        lp_h[2][slot, t], lp_h[3][slot, t], k
                    )
                    for t in range(a)
                ]
                tlps.append(
                    self._slice_top_lp(lp_h[4][slot], lp_h[5][slot], k)
                )
            self.stats["spec_proposed"] += d
            self.stats["spec_accepted"] += a
            for i, tok in enumerate(emitted):
                req.out.append(tok)
                if lps is not None:
                    req.logprobs.append(lps[i])
                if tlps is not None:
                    req.top_lps.append(tlps[i])
                if self.token_counts is not None:
                    # Penalties in tree mode: committed tokens fold into
                    # the occurrence counts (the scoring program applies
                    # path-adjusted counts inside the tree).
                    self.token_counts = self.token_counts.at[
                        slot, tok
                    ].add(1)
                if req.on_token is not None:
                    req.on_token(req.rid, tok)
                self.stats["tokens_generated"] += 1
                self._maybe_finish(slot)
                if req.done:
                    break
            if not req.done:
                new_last[slot] = emitted[-1]
        self.last_tokens = jnp.asarray(new_last)
        if self.adaptive_gamma and tick_prop:
            # Tree-depth adaptation on measured acceptance (round 5; same
            # thresholds as the linear tiers): deepen while the winning
            # branch mostly lands, shrink when it mostly misses. One
            # compiled scoring program per depth, bounded by [1, gamma].
            rate = tick_acc / tick_prop
            if rate >= 0.8 and self._gamma_cur < self.gamma:
                self._gamma_cur += 1
            elif rate <= 0.3 and self._gamma_cur > 1:
                self._gamma_cur -= 1
        self.stats["steps"] += 1
        dt = time.perf_counter() - t0
        self.stats["step_times"].append(dt)
        self.watchdog.observe(dt)

    def _prompt_lookup_tick(self, t0: float):
        """Draft-free speculative tick: each active slot proposes gamma
        tokens by copying the continuation of the last place its trailing
        n-gram occurred in its own history (prompt + generated). The target
        scores every window in ONE batched forward (the same program as
        draft-model speculation); greedy acceptance commits 1..gamma+1
        tokens — exactly the plain greedy stream, whatever the proposals."""
        import numpy as _np

        active = jnp.asarray(self.active)
        B = self.cfg.max_batch_size
        g = self._gamma_cur
        props = _np.zeros((B, g), _np.int32)
        for slot in range(B):
            req = self.slot_req[slot]
            if not self.active[slot] or req is None:
                continue
            props[slot] = _ngram_propose(
                req.prompt + req.out, self.prompt_lookup, g
            )
        window = jnp.concatenate(
            [self.last_tokens[:, None], jnp.asarray(props)], axis=1
        )
        score = (
            self._tp_fns["spec_score"] if self._tp_fns is not None
            else partial(_spec_score_and_accept, self.model)
        )
        k_accept = self._tick_keys(3)
        self._bump_slot_steps(active)
        bias = self._assemble_window_bias({
            s: [list(props[s, :t]) for t in range(g + 1)]
            for s in range(B)
        })
        # draft_logits=None: point-mass proposals (q~ = one-hot).
        wl = self._want_logprobs()
        out = score(
            self.params, self.caches, window, active, k_accept, self.samp,
            None, bias, want_logprobs=wl,
            counts=self.token_counts, penalty=self.cfg.repetition_penalty,
            adapter_ids=self.adapter_ids, top_lp=self._want_top_lp(),
        )
        if wl:
            corrections, accepted, lp, self.caches = out
        else:
            (corrections, accepted, self.caches), lp = out, None
        self._commit_spec_results(window, corrections, accepted, t0,
                                  logprobs=lp)

    def _commit_spec_results(self, window, corrections, accepted, t0: float,
                             logprobs=None):
        """Shared tail of both speculative tick flavors: emit each active
        slot's accepted prefix + 1 correction token (the rejection draw /
        bonus sample; target argmax on greedy rows), advance bookkeeping,
        and adapt gamma from this tick's acceptance when enabled.
        ``logprobs``: optional (lp_prop [B, g], lp_corr [B, T]) target
        logprobs from the scoring forward (cfg.return_logprobs) — extended
        with per-position top-k alternatives (vals/idx [B, T, K]) when any
        request asked for top_logprobs."""
        window_h = jax.device_get(window)
        corr_h = jax.device_get(corrections)
        accepted_h = jax.device_get(accepted)
        lp_h = jax.device_get(logprobs) if logprobs is not None else None
        import numpy as _np

        g = self._gamma_cur
        tick_prop = tick_acc = 0
        new_last = _np.array(jax.device_get(self.last_tokens))  # mutable copy
        for slot in range(self.cfg.max_batch_size):
            if not self.active[slot]:
                continue
            req = self.slot_req[slot]
            a = int(accepted_h[slot])
            emitted = [int(t) for t in window_h[slot, 1 : 1 + a]]
            emitted.append(int(corr_h[slot, a]))
            lps = None
            if lp_h is not None and (self.cfg.return_logprobs
                                     or req.want_logprobs):
                lps = [float(lp_h[0][slot, t]) for t in range(a)]
                lps.append(float(lp_h[1][slot, a]))
            tlps = None
            if lp_h is not None and len(lp_h) > 2 and req.top_logprobs > 0:
                k = req.top_logprobs
                # Committed token i's alternatives live at window position
                # i; the correction's at position a (same indexing as
                # lp_prop/lp_corr above).
                tlps = [
                    self._slice_top_lp(
                        lp_h[2][slot, t], lp_h[3][slot, t], k
                    )
                    for t in range(a + 1)
                ]
            self.stats["spec_proposed"] += g
            self.stats["spec_accepted"] += a
            tick_prop += g
            tick_acc += a
            for i, tok in enumerate(emitted):
                req.out.append(tok)
                if lps is not None:
                    req.logprobs.append(lps[i])
                if tlps is not None:
                    req.top_lps.append(tlps[i])
                if self.token_counts is not None:
                    # Penalties in linear spec mode: fold committed tokens
                    # into the occurrence counts (the scoring program applies
                    # prefix-adjusted counts inside the window).
                    self.token_counts = self.token_counts.at[
                        slot, tok
                    ].add(1)
                if req.on_token is not None:
                    req.on_token(req.rid, tok)
                self.stats["tokens_generated"] += 1
                self._maybe_finish(slot)
                if req.done:
                    break  # tokens past eos/max_new are discarded
            if not req.done:
                new_last[slot] = emitted[-1]
        self.last_tokens = jnp.asarray(new_last)
        if self.adaptive_gamma and tick_prop:
            # Acceptance-rate feedback: widen the lookahead while proposals
            # mostly land (amortizing more tokens per target forward), shrink
            # it when they mostly miss (wasted draft+score work). Compiles
            # one program per gamma value — bounded by the [1, gamma] range.
            rate = tick_acc / tick_prop
            if rate >= 0.8 and self._gamma_cur < self.gamma:
                self._gamma_cur += 1
            elif rate <= 0.3 and self._gamma_cur > 1:
                self._gamma_cur -= 1
        self.stats["steps"] += 1
        dt = time.perf_counter() - t0
        self.stats["step_times"].append(dt)
        self.watchdog.observe(dt)

    def run(self):
        """Drain all queued requests; returns {rid: generated token list}."""
        while self.has_work():
            self.step()
        out = {r.rid: r.out for r in self.finished}
        return out

    # -- observability -----------------------------------------------------

    def profile_window(self, n_steps: int = 8, logdir: str = "/tmp/protoquant_trace"):
        """Capture a jax.profiler trace of the next n engine steps
        (SURVEY.md §5.1). Returns the trace directory."""
        from ..utils.profiling import trace

        with trace(logdir):
            for _ in range(n_steps):
                if not self.has_work():
                    break
                self.step()
        return logdir

    def metrics(self) -> dict:
        times = list(self.stats["step_times"])
        times.sort()
        pct = lambda p: times[int(p * (len(times) - 1))] if times else 0.0
        occupancy = sum(self.active) / max(1, self.cfg.max_batch_size)
        out = {
            "steps": self.stats["steps"],
            "tokens_generated": self.stats["tokens_generated"],
            "prefills": self.stats["prefills"],
            "batch_occupancy": occupancy,
            "queue_depth": len(self.waiting),
            "prefilling": len(self.prefilling),
            "step_p50_ms": 1e3 * pct(0.5),
            "step_p99_ms": 1e3 * pct(0.99),
        }
        waits = sorted(self.stats["queue_waits"])
        if waits:
            wp = lambda p: waits[int(p * (len(waits) - 1))]
            out["queue_wait_p50_ms"] = 1e3 * wp(0.5)
            out["queue_wait_p99_ms"] = 1e3 * wp(0.99)
        if self.allocator is not None:
            out["kv_pages_free"] = sum(a.num_free for a in self.allocators)
            out["kv_pages_total"] = sum(a.num_pages for a in self.allocators)
        if self.prefix is not None:
            out["prefix_hit_tokens"] = sum(p.hit_tokens for p in self.prefixes)
            out["prefix_cached_pages"] = sum(
                p.cached_pages for p in self.prefixes)
            out["prefix_reusable_pages"] = sum(
                p.reusable_pages for p in self.prefixes)
            out["prefix_evictions"] = sum(p.evictions for p in self.prefixes)
        if (self.draft_caches is not None or self.prompt_lookup
                or self.medusa_params is not None
                or self.eagle_caches is not None):
            out["spec_acceptance_rate"] = self.stats["spec_accepted"] / max(
                1, self.stats["spec_proposed"]
            )
        return out


def _cache_probe(cache):
    """Small finite-ness probe of a cache (debug mode)."""
    if hasattr(cache, "vs"):
        return cache.vs.ravel()[:1024]
    return cache.v.ravel()[:1024]


@partial(jax.jit, static_argnames=("model",), donate_argnums=(2,))
def _extend_slot(model: LlamaModel, params, caches, tokens, true_len, slot,
                 adapter_ids=None):
    """Prefill one chunk into a slot (single-device path)."""
    return _extend_slot_body(
        model, params, caches, tokens, true_len, slot,
        adapter_ids=adapter_ids,
    )


@partial(jax.jit, static_argnames=("model",), donate_argnums=(2,))
def _extend_slot_hidden(model: LlamaModel, params, caches, tokens, true_len,
                        slot, adapter_ids=None):
    """_extend_slot that also returns the chunk's final-norm hidden states
    [1, Tpad, D] (EAGLE prefill: the feature draft tracks the prompt)."""
    return _extend_slot_body(
        model, params, caches, tokens, true_len, slot, return_hidden=True,
        adapter_ids=adapter_ids,
    )


@partial(jax.jit, static_argnames=("draft",), donate_argnums=(2,))
def _eagle_extend_slot(draft, dparams, cache, feats, tok_embeds, true_len,
                       slot):
    """Prefill one chunk into the EAGLE draft's own KV cache: the draft
    consumes (base feature at p-1, emb(token at p)) for each chunk
    position, so at decode time its attention sees the whole prompt in
    feature space (a zero feature fills global position 0)."""
    sub = cache.slot_view(slot)
    Tpad = feats.shape[1]
    start = sub.lengths[0]
    positions = start + jnp.arange(Tpad)[None, :]
    max_pos = draft.cfg.max_position_embeddings - 1
    positions = jnp.minimum(positions, max_pos)
    _, _, sub = draft.apply(
        dparams, feats, tok_embeds, positions, sub,
        advance=jnp.full((1,), true_len, jnp.int32),
    )
    return cache.merge_slot(sub, slot)


import functools as _functools


@_functools.cache
def _tree_topology(branches: int, depth: int):
    """Static candidate-tree layout: node 0 = root (the last committed
    token); branch b occupies node indices 1+b*depth .. (b+1)*depth as a
    chain off the root. Returns (depths [T], ancestor mask [T, T] np.bool_)
    with T = 1 + branches*depth. Cached per shape — one compiled scoring
    program per (branches, depth)."""
    import numpy as _np

    T = 1 + branches * depth
    parent = _np.zeros(T, _np.int32)
    depths = _np.zeros(T, _np.int32)
    for b in range(branches):
        for k in range(depth):
            i = 1 + b * depth + k
            parent[i] = 0 if k == 0 else i - 1
            depths[i] = k + 1
    mask = _np.zeros((T, T), _np.bool_)
    for i in range(T):
        j = i
        while True:
            mask[i, j] = True
            if j == 0:
                break
            j = parent[j]
    return depths, mask


def _ngram_propose_branches(hist: list, n: int, depth: int,
                            branches: int):
    """Up to ``branches`` candidate continuations of ``hist``: the most
    recent occurrences of the trailing n-gram (backing off to shorter
    n-grams), keeping continuations with DISTINCT first tokens (identical
    first tokens share their fate under greedy acceptance — scoring them
    twice wastes tree width). Returns [branches, depth] int32 (zero-filled
    rows where fewer candidates exist — harmless: acceptance only commits
    proposals matching the target's own greedy choice)."""
    import numpy as _np

    out = _np.zeros((branches, depth), _np.int32)
    seen_first = set()
    row = 0
    for nn in range(min(n, len(hist) - 1), 0, -1):
        if row >= branches:
            break
        pat = hist[-nn:]
        for i in range(len(hist) - nn - 1, -1, -1):
            if hist[i : i + nn] == pat:
                cont = hist[i + nn : i + nn + depth]
                if not cont or cont[0] in seen_first:
                    continue
                seen_first.add(cont[0])
                out[row, : len(cont)] = cont
                row += 1
                if row >= branches:
                    break
        if row:
            break  # same backoff semantics as _ngram_propose: first nn wins
    return out


def _tree_score_and_accept_body(model, params, caches, window, active, key,
                                samp, branches: int, depth: int,
                                heads=None, head_params=None, bias=None,
                                counts=None, penalty=1.0,
                                want_logprobs=False, adapter_ids=None,
                                top_lp=0, return_hidden=False):
    """Score a [B, T=1+branches*depth] candidate tree in ONE forward
    (ancestor attention mask, rope positions = frontier + node depth),
    pick each slot's accepted branch, compact that branch's K/V rows into
    chain order (cache.reorder_tail) and commit accepted+1 positions.

    Acceptance per row:
      * greedy rows (samp temp 0): longest greedy-accepted prefix across
        branches — the stream is EXACTLY plain greedy decoding.
      * sampling rows: distribution-exact tree rejection sampling. At the
        root, SpecInfer-style multi-round rejection over the branches'
        first tokens (point-mass proposals: accept x_b with the residual's
        probability of x_b; a rejected token zeroes out and the residual
        renormalizes — the first emitted token's marginal is exactly the
        filtered target p~). Down the chosen chain each node is standard
        single-candidate rejection; the first rejection samples that
        node's residual (p~ minus the rejected candidate, renormalized),
        and a fully accepted chain draws the bonus token from the leaf's
        p~. Every emitted token's marginal is exactly p~ — temperature>0
        tree streams are distribution-identical to plain sampling
        (TVD test in tests/test_tree_sampling.py).

    Returns (best [B], accepted [B], corrections [B], caches): the slot
    emits window[1+best*depth : ...+accepted] then ``corrections`` (the
    correction/bonus token after the accepted prefix).

    With trained drafting heads (``heads``/``head_params``,
    models/medusa.py) the same program also returns ``next_props
    [B, branches, depth]``: the heads run on the hidden state at each
    slot's last accepted node — the node whose greedy token became the
    committed correction, i.e. the state that PREDICTS the new frontier's
    successors — so next tick's candidate tree costs zero extra forwards."""
    depths_np, mask_np = _tree_topology(branches, depth)
    depths = jnp.asarray(depths_np)
    tree_mask = jnp.asarray(mask_np)
    B, T = window.shape
    max_pos = model.cfg.max_position_embeddings - 1
    positions = jnp.minimum(
        caches[0].lengths[:, None] + depths[None, :], max_pos
    )
    if heads is not None or return_hidden:
        logits, caches, hidden = model.apply(
            params, window, positions, caches,
            advance=jnp.zeros((B,), jnp.int32), tree_mask=tree_mask,
            return_hidden=True, adapter_ids=adapter_ids,
        )
    else:
        logits, caches = model.apply(
            params, window, positions, caches,
            advance=jnp.zeros((B,), jnp.int32), tree_mask=tree_mask,
            adapter_ids=adapter_ids,
        )
    if bias is not None:
        # Guided decoding [B, T, V]: per-NODE mask/bias rows evaluated
        # host-side at the FSM state along each branch's path (node i's
        # logits predict the token after committed + that branch's prefix).
        # Head-proposed candidates stay unmasked — exactness never depends
        # on proposals, only acceptance quality does.
        logits = logits + bias
    V = logits.shape[-1]
    # Pre-penalty logits (serving-API logprob convention, see the linear
    # accept program).
    logits_lp = logits
    if counts is not None:
        # Penalties with PATH-adjusted counts: node i predicts the
        # successor of window[i], so its penalized logits see ``counts``
        # plus one for every token on its root-to-self path EXCEPT node 0
        # (the committed frontier token, counted at its own commit). The
        # ancestor-or-self mask IS that path — matmul it over the window's
        # one-hots.
        from .sampling import (
            apply_presence_frequency,
            apply_repetition_penalty,
        )

        M = jnp.asarray(mask_np).astype(counts.dtype).at[:, 0].set(0)
        oh = jax.nn.one_hot(window, V, dtype=counts.dtype)  # [B, T, V]
        wcounts = counts[:, None] + jnp.einsum("ij,bjv->biv", M, oh)
        flat = logits.reshape(B * T, V)
        wc = wcounts.reshape(B * T, V)
        flat = apply_repetition_penalty(flat, wc, penalty)
        flat = apply_presence_frequency(
            flat, wc,
            jnp.repeat(samp["pres_pens"], T, axis=0),
            jnp.repeat(samp["freq_pens"], T, axis=0),
        )
        logits = flat.reshape(B, T, V)
    greedy = jnp.argmax(logits, -1).astype(jnp.int32)  # [B, T]

    idx = 1 + jnp.arange(branches)[:, None] * depth + jnp.arange(depth)[None, :]
    # pred[b, j, k] = target's greedy choice at branch j's node k's PARENT.
    parents = jnp.concatenate(
        [jnp.zeros((branches, 1), jnp.int32), idx[:, :-1]], axis=1
    )  # [J, d]
    pred = greedy[:, parents]  # [B, J, d]
    prop = window[:, idx]  # [B, J, d]
    acc = jnp.cumprod((prop == pred).astype(jnp.int32), axis=2)
    accepted_per = jnp.sum(acc, axis=2)  # [B, J]
    best_g = jnp.argmax(accepted_per, axis=1).astype(jnp.int32)  # [B]
    accepted_g = jnp.take_along_axis(accepted_per, best_g[:, None], 1)[:, 0]

    # ---- sampling rows: distribution-exact tree rejection ---------------
    from .sampling import processed_logits

    rep = lambda a, n: jnp.repeat(a, n, axis=0)
    p = jax.nn.softmax(
        processed_logits(
            logits.reshape(B * T, V), rep(samp["temps"], T),
            rep(samp["top_ks"], T), rep(samp["top_ps"], T),
            rep(samp["min_ps"], T),
        ).reshape(B, T, V),
        axis=-1,
    )
    rows = jnp.arange(B)
    if key.ndim == 2:
        # Per-row keys (per-request seeds).
        u_root = jax.vmap(
            lambda k: jax.random.uniform(
                jax.random.fold_in(k, 0), (branches,)
            )
        )(key)
        u_chain = jax.vmap(
            lambda k: jax.random.uniform(
                jax.random.fold_in(k, 1), (branches, depth)
            )
        )(key)
        k_corr = None
    else:
        k_root, k_chain, k_corr = jax.random.split(key, 3)
        u_root = jax.random.uniform(k_root, (B, branches))
        u_chain = jax.random.uniform(k_chain, (B, branches, depth))
    # Root multi-round: try each branch's first token in branch order
    # against the running residual. Duplicate first tokens are fine (a
    # zeroed token re-proposed has residual prob 0 -> auto-rejected), as
    # are zero-filled placeholder branches (rejection sampling is exact
    # for ANY proposal sequence; bad proposals only cost acceptance rate).
    r = p[:, 0]
    chosen = jnp.full((B,), branches, jnp.int32)  # == branches: none yet
    for b in range(branches):
        c = prop[:, b, 0]
        rc = jnp.take_along_axis(r, c[:, None], 1)[:, 0]
        hit = (u_root[:, b] < rc) & (chosen == branches)
        chosen = jnp.where(hit, b, chosen)
        r = r.at[rows, c].set(0.0)
        rs = jnp.sum(r, -1, keepdims=True)
        # rs == 0 is unreachable with exact arithmetic (the last candidate
        # holding all remaining mass has acceptance prob 1); numeric guard.
        r = jnp.where(rs > 0, r / rs, p[:, 0])
    root_resid = r
    best_s = jnp.minimum(chosen, branches - 1)
    # Chain rounds (depth >= 2): single point-mass candidate per node —
    # accept with the parent node's filtered probability of the candidate.
    par_b = jnp.broadcast_to(parents[None], (B, branches, depth))
    lin = (rows[:, None, None] * T + par_b).reshape(-1)
    p_at = p.reshape(B * T, V)[lin, prop.reshape(-1)].reshape(
        B, branches, depth
    )
    acc_chain = u_chain < p_at
    sel = lambda a: jnp.take_along_axis(a, best_s[:, None, None], 1)[:, 0]
    acc_seq = jnp.concatenate(
        [(chosen < branches)[:, None], sel(acc_chain)[:, 1:]], axis=1
    )  # [B, d]
    accepted_s = jnp.sum(
        jnp.cumprod(acc_seq.astype(jnp.int32), axis=1), axis=1
    )
    # Correction: root residual when a=0; the rejecting node's residual
    # (p~ minus the rejected candidate, renormalized) when 0<a<d; the
    # leaf's p~ (bonus draw) when the whole chain accepted.
    best_idx_s = 1 + best_s[:, None] * depth + jnp.arange(depth)[None, :]
    node_s = jnp.where(
        accepted_s > 0,
        jnp.take_along_axis(
            best_idx_s, jnp.maximum(accepted_s - 1, 0)[:, None], 1
        )[:, 0],
        0,
    )
    dist = jnp.take_along_axis(p, node_s[:, None, None], 1)[:, 0]  # [B, V]
    rej_tok = jnp.take_along_axis(
        sel(prop), jnp.minimum(accepted_s, depth - 1)[:, None], 1
    )[:, 0]
    need_resid = (accepted_s > 0) & (accepted_s < depth)
    zeroed = dist.at[rows, rej_tok].set(0.0)
    zs = jnp.sum(zeroed, -1, keepdims=True)
    zeroed = jnp.where(zs > 0, zeroed / zs, dist)  # numeric guard (see above)
    dist = jnp.where(need_resid[:, None], zeroed, dist)
    dist = jnp.where((accepted_s == 0)[:, None], root_resid, dist)
    if key.ndim == 2:
        corr_s = jax.vmap(
            lambda k, d: jax.random.categorical(
                jax.random.fold_in(k, 2),
                jnp.log(jnp.maximum(d, 1e-38)),
            )
        )(key, dist).astype(jnp.int32)
    else:
        corr_s = jax.random.categorical(
            k_corr, jnp.log(jnp.maximum(dist, 1e-38)), axis=-1
        ).astype(jnp.int32)

    # ---- combine greedy/sampling rows -----------------------------------
    is_greedy = samp["temps"] == 0.0
    best = jnp.where(is_greedy, best_g, best_s).astype(jnp.int32)
    accepted = jnp.where(is_greedy, accepted_g, accepted_s)

    # Last accepted node (root when a=0): the greedy correction reads the
    # target's greedy token there; the heads run on its hidden state.
    best_idx = 1 + best[:, None] * depth + jnp.arange(depth)[None, :]  # [B, d]
    corr_node = jnp.where(
        accepted > 0,
        jnp.take_along_axis(
            best_idx, jnp.maximum(accepted - 1, 0)[:, None], 1
        )[:, 0],
        0,
    )
    corr_g = jnp.take_along_axis(greedy, corr_node[:, None], 1)[:, 0]
    corrections = jnp.where(is_greedy, corr_g, corr_s)

    next_props = None
    h_corr = None
    if heads is not None or return_hidden:
        # Hidden state at the last accepted node — the state that predicted
        # the committed correction: trained heads propose from it, and the
        # EAGLE-tree tick re-anchors its feature draft on it.
        h_corr = jnp.take_along_axis(
            hidden, corr_node[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]  # [B, D]
    if heads is not None:
        from ..models.medusa import HydraHeads, propose_from_heads

        if isinstance(heads, HydraHeads):
            # Sequential (Hydra) heads chain on the proposed tokens; the
            # base model's (replicated) embedding table feeds the chain.
            emb = params.get("params", params)["embed_tokens"]["embedding"]
            next_props = heads.apply(
                head_params, h_corr, corrections, emb, branches,
                method=HydraHeads.propose,
            )[:, :, :depth]
        else:
            head_logits = heads.apply(head_params, h_corr)  # [B, heads, V]
            next_props = propose_from_heads(
                head_logits[:, :depth, :], branches
            )  # [B, J, d]

    # Compact the winning branch into chain slots, then advance lengths
    # (cache.advance: a length bump, plus chunk flushes on the int4 tier).
    caches = [c.reorder_tail(best_idx) for c in caches]
    adv = jnp.where(active, accepted + 1, 0).astype(jnp.int32)
    caches = [c.advance(adv) for c in caches]
    out = [best, accepted, corrections]
    if heads is not None:
        out.append(next_props)
    if return_hidden:
        out.append(h_corr.astype(jnp.float32))
    if want_logprobs:
        # Target logprobs (pre-penalty, pre-truncation) along the winning
        # branch: lp_path[s, k] = logp of the branch's k-th proposal at its
        # parent node; lp_corr[s] = logp of the correction at the last
        # accepted node. The host gathers the committed subset.
        rowsT = rows[:, None, None] * T
        lin_all = (rowsT + par_b).reshape(-1)
        logz = jax.nn.logsumexp(logits_lp, axis=-1)  # [B, T]
        lp_all = (
            logits_lp.reshape(B * T, V)[lin_all, prop.reshape(-1)]
            - logz.reshape(B * T)[lin_all]
        ).reshape(B, branches, depth)
        lp_path = jnp.take_along_axis(
            lp_all, best[:, None, None], 1
        )[:, 0]  # [B, d]
        lp_corr = (
            logits_lp[rows, corr_node, corrections]
            - logz[rows, corr_node]
        )  # [B]
        lp_out = (lp_path, lp_corr)
        if top_lp:
            # Alternatives along the WINNING branch only (the committed
            # positions): the k-th committed proposal's alternatives live
            # at its parent node, the correction's at corr_node.
            from .sampling import top_logprobs as _top_lp_fn

            win_parents = jnp.take_along_axis(
                par_b, best[:, None, None], 1
            )[:, 0]  # [B, d] node index of each winning-branch parent
            node_logits = jnp.take_along_axis(
                logits_lp, win_parents[:, :, None], axis=1
            )  # [B, d, V]
            tlp = _top_lp_fn(node_logits, top_lp)  # ([B,d,K], [B,d,K])
            tlc = _top_lp_fn(logits_lp[rows, corr_node], top_lp)  # [B,K]x2
            lp_out = lp_out + tlp + tlc
        out.append(lp_out)
    out.append(caches)
    return tuple(out)


@partial(jax.jit, static_argnames=("model", "branches", "depth", "penalty",
                                   "want_logprobs", "top_lp"),
         donate_argnums=(2,))
def _tree_score_and_accept(model, params, caches, window, active, key, samp,
                           branches: int, depth: int, bias=None,
                           counts=None, penalty=1.0, want_logprobs=False,
                           adapter_ids=None, top_lp=0):
    return _tree_score_and_accept_body(
        model, params, caches, window, active, key, samp, branches, depth,
        bias=bias, counts=counts, penalty=penalty,
        want_logprobs=want_logprobs, adapter_ids=adapter_ids, top_lp=top_lp,
    )


@partial(jax.jit, static_argnames=("model", "branches", "depth", "penalty",
                                   "want_logprobs", "top_lp"),
         donate_argnums=(2,))
def _tree_score_and_accept_hidden(model, params, caches, window, active,
                                  key, samp, branches: int, depth: int,
                                  bias=None, counts=None, penalty=1.0,
                                  want_logprobs=False, adapter_ids=None,
                                  top_lp=0):
    """Tree scorer that also returns the hidden state at each slot's last
    accepted node (the EAGLE-tree tick's true-feature re-anchor)."""
    return _tree_score_and_accept_body(
        model, params, caches, window, active, key, samp, branches, depth,
        bias=bias, counts=counts, penalty=penalty,
        want_logprobs=want_logprobs, adapter_ids=adapter_ids, top_lp=top_lp,
        return_hidden=True,
    )


@partial(jax.jit, static_argnames=("model", "heads", "branches", "depth",
                                   "penalty", "want_logprobs", "top_lp"),
         donate_argnums=(3,))
def _tree_score_and_accept_heads(model, heads, params, caches, head_params,
                                 window, active, key, samp,
                                 branches: int, depth: int, bias=None,
                                 counts=None, penalty=1.0,
                                 want_logprobs=False, adapter_ids=None,
                                 top_lp=0):
    return _tree_score_and_accept_body(
        model, params, caches, window, active, key, samp, branches, depth,
        heads=heads, head_params=head_params, bias=bias, counts=counts,
        penalty=penalty, want_logprobs=want_logprobs,
        adapter_ids=adapter_ids, top_lp=top_lp,
    )


def _ngram_propose(hist: list, n: int, gamma: int) -> list:
    """Prompt-lookup proposal: find the most recent earlier occurrence of
    the trailing n-gram of ``hist`` (backing off to shorter n-grams) and
    copy the gamma tokens that followed it. Unfilled positions return 0 —
    harmless, since greedy acceptance only ever commits proposals that equal
    the target's own greedy choice."""
    out = [0] * gamma
    for nn in range(min(n, len(hist) - 1), 0, -1):
        pat = hist[-nn:]
        for i in range(len(hist) - nn - 1, -1, -1):
            if hist[i : i + nn] == pat:
                # i + nn <= len(hist) - 1, so there is always >= 1 token.
                cont = hist[i + nn : i + nn + gamma]
                out[: len(cont)] = cont
                return out
    return out


# -- speculative decode tick (engine mode; SURVEY.md §3.4 / A3 extension) ----


@partial(jax.jit, static_argnames=("draft", "gamma"), donate_argnums=(2,))
def _eagle_propose(draft, dparams, cache, feats, last_tokens, emb, active,
                   key, samp, gamma: int, bias=None):
    """EAGLE proposal chain: step i consumes (f, emb(tok)) — the feature
    that predicted ``tok`` plus ``tok``'s embedding — through the one-layer
    feature draft (own KV cache) and samples proposal i from the draft's
    filtered logits. The predicted feature f̂ chains into step i+1. One
    extra step leaves K/V for the final proposal in the cache (all-accepted
    case). Returns (proposals [B, gamma], draft_logits [B, gamma, V],
    cache) — logits feed the exact rejection-sampling accept program."""
    from .sampling import sample_batched

    advance = active.astype(jnp.int32)
    max_pos = draft.cfg.max_position_embeddings - 1

    def body(carry, i):
        tok, f, cache = carry
        positions = jnp.minimum(cache.lengths, max_pos)[:, None]
        f_hat, logits, cache = draft.apply(
            dparams, f[:, None, :], emb[tok][:, None, :], positions, cache,
            advance=advance,
        )
        last = logits[:, -1]
        if bias is not None:
            last = last + bias
        ki = (
            jax.vmap(lambda k: jax.random.fold_in(k, i))(key)
            if key.ndim == 2 else jax.random.fold_in(key, i)
        )
        nxt = sample_batched(
            last, ki, samp["temps"], samp["top_ks"],
            samp["top_ps"], samp["min_ps"],
        )
        return (nxt, f_hat[:, -1], cache), (nxt, last)

    (last, f, cache), (proposals, dlogits) = jax.lax.scan(
        body, (last_tokens, feats, cache), jnp.arange(gamma)
    )
    positions = jnp.minimum(cache.lengths, max_pos)[:, None]
    _, _, cache = draft.apply(
        dparams, f[:, None, :], emb[last][:, None, :], positions, cache,
        advance=advance,
    )
    return proposals.T, jnp.swapaxes(dlogits, 0, 1), cache


@partial(jax.jit, static_argnames=("draft", "branches", "depth"))
def _eagle_propose_tree(draft, dparams, cache, feats, last_tokens, emb,
                        active, branches: int, depth: int):
    """EAGLE-2-style tree expansion (VERDICT r4 item 2): expand the draft's
    step-1 distribution into its top-``branches`` candidates, then continue
    each branch greedily to ``depth`` — producing the [B, J, d] candidate
    tree the one-forward tree scorer (_tree_score_and_accept) consumes.

    Branch state lives in a slot-major batch replication: the draft cache
    is repeated J ways to [B*J, ...] (every dense-cache leaf is batch-major
    — kv_cache._DenseSlotViews invariant), level 1 writes identical rows
    for all J copies (the frontier input is branch-independent), and levels
    2..d chain each branch's own (f_hat, emb(token)) through its own copy.
    The replicated cache is a per-tick transient: after acceptance the
    winning branch's copy becomes the persistent draft cache
    (_eagle_tree_select) — its rows along the accepted chain are exactly
    the entries linear-EAGLE drafting would have written, so the next
    tick's propose attends over a seamless feature history.

    Acceptance exactness never depends on how candidates were chosen
    (greedy rows commit only target-argmax matches; sampled rows run
    distribution-exact tree rejection), so the deterministic top-J/greedy
    expansion is safe at ANY temperature — proposal quality is all it
    affects. Memory: J transient copies of the ONE-layer draft cache.

    Returns (props [B, J, depth] int32, cache_rep [B*J, ...])."""
    B = last_tokens.shape[0]
    J = branches
    rep = lambda a: jnp.repeat(a, J, axis=0)
    cache = jax.tree_util.tree_map(rep, cache)
    advance = rep(active).astype(jnp.int32)
    max_pos = draft.cfg.max_position_embeddings - 1

    def body(carry, i):
        tok, f, cache = carry
        positions = jnp.minimum(cache.lengths, max_pos)[:, None]
        f_hat, logits, cache = draft.apply(
            dparams, f[:, None, :], emb[tok][:, None, :], positions, cache,
            advance=advance,
        )
        last = logits[:, -1]  # [B*J, V]
        # Level 1: branch j takes the j-th most likely token (all copies
        # carry identical logits; read copy 0). Deeper levels: greedy
        # continuation per branch.
        topj = (
            jax.lax.top_k(last.reshape(B, J, -1)[:, 0], J)[1]
            .astype(jnp.int32)
            .reshape(B * J)
        )
        greedy = jnp.argmax(last, -1).astype(jnp.int32)
        nxt = jnp.where(i == 0, topj, greedy)
        return (nxt, f_hat[:, -1], cache), nxt

    (last, f, cache), proposals = jax.lax.scan(
        body, (rep(last_tokens), rep(feats), cache), jnp.arange(depth)
    )
    # One extra step: K/V rows for the final proposals (the all-accepted
    # case needs them in the winning branch's cache next tick).
    positions = jnp.minimum(cache.lengths, max_pos)[:, None]
    _, _, cache = draft.apply(
        dparams, f[:, None, :], emb[last][:, None, :], positions, cache,
        advance=advance,
    )
    # scan stacks on axis 0: [depth, B*J] -> [B, J, depth].
    props = proposals.T.reshape(B, J, depth)
    return props, cache


@partial(jax.jit, static_argnames=("branches",))
def _eagle_tree_select(cache_rep, best, branches: int):
    """Collapse the [B*J, ...] replicated draft cache to the winning
    branch's copy per slot ([B, ...]) — the persistent cache for the next
    tick (rows along the accepted chain are already in chain order, so no
    reorder_tail is needed on the draft side)."""
    B = best.shape[0]

    def sel(leaf):
        lr = leaf.reshape((B, branches) + leaf.shape[1:])
        idx = best.reshape((B,) + (1,) * (lr.ndim - 1))
        return jnp.take_along_axis(lr, idx, axis=1)[:, 0]

    return jax.tree_util.tree_map(sel, cache_rep)


@partial(jax.jit, static_argnames=("model", "gamma"), donate_argnums=(2,))
def _draft_propose(model, params, caches, last_tokens, active, key, samp,
                   gamma: int, bias=None):
    """Draft gamma proposals per slot (batched), then one extra step so the
    draft cache also holds K/V for the final proposal (needed when all gamma
    tokens are accepted).

    Greedy rows (samp temp 0) propose the argmax; sampling rows draw from
    the draft's FILTERED distribution q~ (same temp/top-k/top-p/min-p chain
    as plain decode — sampling.processed_logits), whose logits are returned
    so the accept program can compute q~ filter-for-filter.

    ``bias`` [B, V]: the tick-start guided-decoding bias (logit masks +
    logit_bias). Added BEFORE sampling and included in the returned logits,
    so q~ is exactly the distribution the draft proposed from — rejection
    sampling stays exact whatever the bias (for stateful masks this is the
    window-start FSM state: a heuristic for proposal quality only; the
    accept program re-masks per position).
    Returns (proposals [B, gamma], draft_logits [B, gamma, V], caches)."""
    from .sampling import sample_batched

    advance = active.astype(jnp.int32)
    max_pos = model.cfg.max_position_embeddings - 1

    def body(carry, i):
        tok, caches = carry
        positions = jnp.minimum(caches[0].lengths, max_pos)[:, None]
        logits, caches = model.apply(
            params, tok[:, None], positions, caches, advance=advance
        )
        last = logits[:, -1]
        if bias is not None:
            last = last + bias
        ki = (
            jax.vmap(lambda k: jax.random.fold_in(k, i))(key)
            if key.ndim == 2 else jax.random.fold_in(key, i)
        )
        nxt = sample_batched(
            last, ki, samp["temps"], samp["top_ks"],
            samp["top_ps"], samp["min_ps"],
        )
        return (nxt, caches), (nxt, last)

    (last, caches), (proposals, dlogits) = jax.lax.scan(
        body, (last_tokens, caches), jnp.arange(gamma)
    )
    positions = jnp.minimum(caches[0].lengths, max_pos)[:, None]
    _, caches = model.apply(params, last[:, None], positions, caches, advance=advance)
    # scan stacks on axis 0 -> [B, gamma] / [B, gamma, V].
    return proposals.T, jnp.swapaxes(dlogits, 0, 1), caches


def _spec_score_and_accept_body(model, params, caches, window, active, key,
                                samp, draft_logits=None, bias=None,
                                return_hidden=False, want_logprobs=False,
                                counts=None, penalty=1.0,
                                adapter_ids=None, top_lp=0):
    """Target scores every slot's [last_token, p_1..p_gamma] window in ONE
    forward with advance=0 (lengths frozen — cache rollback is free, see
    models/speculative.py), accepts a per-slot prefix, and commits
    accepted+1 positions per active slot. Shared by the single-device jit
    and the mesh shard_map wrapper (TP model: psums live in model.apply).

    Acceptance per row:
      * greedy rows (samp temp 0): proposal == target argmax — the stream is
        EXACTLY plain greedy decoding.
      * sampling rows: standard speculative rejection sampling (Leviathan et
        al.) against the FILTERED target distribution p~ (same temperature/
        top-k/top-p/min-p chain plain decode samples from): accept x_i with
        prob min(1, p~(x_i)/q~(x_i)); on rejection emit a draw from
        norm(max(p~-q~, 0)); if all gamma accepted, draw the bonus token
        from p~ at the final position. This leaves every emitted token's
        marginal exactly p~ — temperature>0 streams are distribution-
        identical to plain sampling (distribution test in
        tests/test_speculative_sampling.py).

    ``draft_logits`` [B, gamma, V]: the draft's raw logits (q~ recomputed
    here with the row's own filters). None => point-mass proposals
    (prompt-lookup): q~ = one-hot, so acceptance prob is p~(x_i) and the
    residual is p~ with x_i removed, renormalized.

    Returns (corrections [B, T], accepted [B], caches): corrections[s, a] is
    the token slot s emits after its ``a`` accepted proposals.
    """
    import dataclasses

    from .sampling import processed_logits

    B, T = window.shape
    g = T - 1
    max_pos = model.cfg.max_position_embeddings - 1
    positions = jnp.minimum(
        caches[0].lengths[:, None] + jnp.arange(T)[None, :], max_pos
    )
    if return_hidden:
        # EAGLE tick: the feature-space draft re-anchors on the TRUE base
        # hidden at the last accepted position next tick.
        logits, caches, hidden = model.apply(
            params, window, positions, caches,
            advance=jnp.zeros((B,), jnp.int32), return_hidden=True,
            adapter_ids=adapter_ids,
        )
    else:
        logits, caches = model.apply(
            params, window, positions, caches,
            advance=jnp.zeros((B,), jnp.int32), adapter_ids=adapter_ids,
        )
    if bias is not None:
        # Guided decoding [B, T, V]: per-position mask/bias rows evaluated
        # host-side at the FSM state along the proposed path — greedy rows
        # then argmax the masked logits and sampling rows reject/residual
        # against the masked p~, exactly as plain masked decode would.
        logits = logits + bias
    V = logits.shape[-1]
    # Pre-penalty logits: the serving-API logprob convention reports the
    # model's own distribution, before repetition/presence/frequency
    # adjustments (matching the plain decode tick's token_logprob call).
    logits_lp = logits
    if counts is not None:
        # Repetition / presence / frequency penalties with PREFIX-adjusted
        # counts: window position t sees ``counts`` plus one for each of
        # window[1..t] — the tokens this tick commits before it — so every
        # position's penalized logits equal what plain decode would have
        # computed after committing that prefix (exactness under penalties).
        from .sampling import (
            apply_presence_frequency,
            apply_repetition_penalty,
        )

        B_, T_ = window.shape
        inc = jax.nn.one_hot(window[:, 1:], V, dtype=counts.dtype)
        cum = jnp.cumsum(inc, axis=1)  # [B, g, V]
        wcounts = jnp.concatenate(
            [counts[:, None], counts[:, None] + cum], axis=1
        )  # [B, T, V]
        flat = logits.reshape(B_ * T_, V)
        wc = wcounts.reshape(B_ * T_, V)
        flat = apply_repetition_penalty(flat, wc, penalty)
        flat = apply_presence_frequency(
            flat, wc,
            jnp.repeat(samp["pres_pens"], T_, axis=0),
            jnp.repeat(samp["freq_pens"], T_, axis=0),
        )
        logits = flat.reshape(B_, T_, V)
    greedy = jnp.argmax(logits, -1).astype(jnp.int32)  # [B, T]
    proposals = window[:, 1:]  # [B, g]

    # Filtered target distribution p~ at every window position (each row's
    # own sampling filters, broadcast along the window axis).
    rep = lambda a, n: jnp.repeat(a, n, axis=0)
    p_log = processed_logits(
        logits.reshape(B * T, V), rep(samp["temps"], T),
        rep(samp["top_ks"], T), rep(samp["top_ps"], T), rep(samp["min_ps"], T),
    ).reshape(B, T, V)
    p = jax.nn.softmax(p_log, axis=-1)
    p_at = jnp.take_along_axis(p[:, :g], proposals[..., None], -1)[..., 0]

    if draft_logits is None:
        q = jax.nn.one_hot(proposals, V, dtype=p.dtype)  # [B, g, V]
        q_at = jnp.ones_like(p_at)
    else:
        q_log = processed_logits(
            draft_logits.reshape(B * g, V), rep(samp["temps"], g),
            rep(samp["top_ks"], g), rep(samp["top_ps"], g),
            rep(samp["min_ps"], g),
        ).reshape(B, g, V)
        q = jax.nn.softmax(q_log, axis=-1)
        q_at = jnp.take_along_axis(q, proposals[..., None], -1)[..., 0]

    if key.ndim == 2:
        # Per-row keys [B, 2] (per-request seeds): each slot's rejection/
        # residual draws depend only on its own key chain.
        u = jax.vmap(
            lambda k: jax.random.uniform(jax.random.fold_in(k, 0), (g,))
        )(key)
        k_r = None
    else:
        k_u, k_r = jax.random.split(key)
        u = jax.random.uniform(k_u, (B, g))
    accept_sampling = u * jnp.maximum(q_at, 1e-20) < p_at  # u < p/q
    accept_greedy = proposals == greedy[:, :g]
    is_greedy = (samp["temps"] == 0.0)[:, None]
    acc = jnp.where(is_greedy, accept_greedy, accept_sampling).astype(jnp.int32)
    accepted = jnp.sum(jnp.cumprod(acc, axis=1), axis=1)  # [B] in [0, g]

    # Correction token for EVERY possible acceptance count a (the host picks
    # corrections[s, accepted[s]]): a < g -> residual norm(max(p~-q~, 0))
    # (nonzero whenever rejection can occur; p~ fallback covers the p~ == q~
    # positions, which are always accepted and never read); a == g -> p~.
    resid = jnp.maximum(p[:, :g] - q, 0.0)
    rs = jnp.sum(resid, axis=-1, keepdims=True)
    resid = jnp.where(rs > 0, resid / rs, p[:, :g])
    corr_dist = jnp.concatenate([resid, p[:, g:]], axis=1)  # [B, T, V]
    if key.ndim == 2:
        corr_sampled = jax.vmap(
            lambda k, d: jax.random.categorical(
                jax.random.fold_in(k, 1),
                jnp.log(jnp.maximum(d, 1e-38)), axis=-1,
            )
        )(key, corr_dist).astype(jnp.int32)
    else:
        corr_sampled = jax.random.categorical(
            k_r, jnp.log(jnp.maximum(corr_dist, 1e-38)), axis=-1
        ).astype(jnp.int32)
    corrections = jnp.where(is_greedy, greedy, corr_sampled)

    adv = jnp.where(active, accepted + 1, 0).astype(jnp.int32)
    # cache.advance = length bump + (int4 tier) flush of chunks the commit
    # completes — the scoring forward wrote the window with advance=0.
    caches = [c.advance(adv) for c in caches]
    out = [corrections, accepted]
    if return_hidden:
        # hidden[a] is the state that predicted the token emitted after
        # ``a`` accepted proposals (the correction/bonus) — the anchor the
        # feature draft conditions its next proposal on.
        h_next = jnp.take_along_axis(
            hidden, accepted[:, None, None], axis=1
        )[:, 0].astype(jnp.float32)
        out.append(h_next)
    if want_logprobs:
        # Target logprobs for every token this tick COULD commit, under the
        # serving-API convention (pre-truncation, post-bias — the same
        # ``token_logprob`` contract the plain decode tick reports):
        # lp_prop[s, t] = logp of proposal t at its position, lp_corr[s, t]
        # = logp of the correction emitted after t accepted proposals. The
        # host gathers the committed subset.
        logz = jax.nn.logsumexp(logits_lp, axis=-1)  # [B, T]
        lp_prop = jnp.take_along_axis(
            logits_lp[:, :g], proposals[..., None], -1
        )[..., 0] - logz[:, :g]
        lp_corr = jnp.take_along_axis(
            logits_lp, corrections[..., None], -1
        )[..., 0] - logz
        lp_out = (lp_prop, lp_corr)
        if top_lp:
            # Top-k alternatives at EVERY window position (same convention):
            # committed proposal i reads position i, the correction after a
            # accepted reads position a — the host gathers the committed
            # subset, exactly as it does for lp_prop/lp_corr.
            from .sampling import top_logprobs as _top_lp_fn

            lp_out = lp_out + _top_lp_fn(logits_lp, top_lp)
        out.append(lp_out)
    out.append(caches)
    return tuple(out)


@partial(jax.jit,
         static_argnames=("model", "want_logprobs", "penalty", "top_lp"),
         donate_argnums=(2,))
def _spec_score_and_accept(model, params, caches, window, active, key, samp,
                           draft_logits=None, bias=None,
                           want_logprobs=False, counts=None, penalty=1.0,
                           adapter_ids=None, top_lp=0):
    return _spec_score_and_accept_body(
        model, params, caches, window, active, key, samp, draft_logits,
        bias, want_logprobs=want_logprobs, counts=counts, penalty=penalty,
        adapter_ids=adapter_ids, top_lp=top_lp,
    )


@partial(jax.jit,
         static_argnames=("model", "want_logprobs", "penalty", "top_lp"),
         donate_argnums=(2,))
def _spec_score_and_accept_hidden(model, params, caches, window, active,
                                  key, samp, draft_logits=None, bias=None,
                                  want_logprobs=False, counts=None,
                                  penalty=1.0, adapter_ids=None, top_lp=0):
    return _spec_score_and_accept_body(
        model, params, caches, window, active, key, samp, draft_logits,
        bias, return_hidden=True, want_logprobs=want_logprobs,
        counts=counts, penalty=penalty, adapter_ids=adapter_ids,
        top_lp=top_lp,
    )


def _build_tp_engine_fns(model: LlamaModel, mesh):
    """shard_map-wrapped prefill-extend and decode steps for a mesh engine.

    Model axis = tp (Megatron shardings from parallel/shardings.py); data
    axis = dp replicas with batch-sharded slots. Under dp>1 the global slot
    index maps to (replica, local slot); only the owning replica advances
    its cache (non-owners run the same program with advance=0 — their writes
    land at-or-beyond their own tenant's frontier, where the next real
    decode/prefill write overwrites them before any read)."""
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map as _shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map as _shard_map

    from ..parallel.mesh import DATA_AXIS
    from ..parallel.shardings import cache_pspecs, params_pspecs

    dp = mesh.shape[DATA_AXIS]
    data_axis = DATA_AXIS if dp > 1 else None
    batch_spec = P(DATA_AXIS) if dp > 1 else P()

    fns = {}
    state = {}

    def _specs(params, caches):
        key = "built"
        if key not in state:
            state[key] = (params_pspecs(params), cache_pspecs(caches))
        return state[key]

    def extend_with_adapters(params, caches, tokens, true_len, slot, aid):
        pspecs, cspecs = _specs(params, caches)
        ekey = ("extend", aid is None)
        if ekey not in state:
            # aid: [1] int32 multi-LoRA selection for the slot being
            # prefilled — replicated (every shard gathers the same adapter
            # row of its local lora_a/lora_b shards); None pytree when the
            # model carries no adapter stack.
            @partial(
                _shard_map,
                mesh=mesh,
                in_specs=(pspecs, cspecs, P(), P(), P(), P()),
                out_specs=(P(), cspecs),
                check_vma=False,
            )
            def _extend(params, caches, tokens, true_len, slot, aid):
                return _extend_slot_body(
                    model, params, caches, tokens, true_len, slot,
                    data_axis=data_axis, adapter_ids=aid,
                )

            state[ekey] = jax.jit(_extend, donate_argnums=(1,))
        return state[ekey](params, caches, tokens, true_len, slot, aid)

    def decode(
        params, caches, last_tokens, active, key, samp,
        penalty=1.0, counts=None, adapter_ids=None, logit_bias=None,
        top_lp=0,
    ):
        pspecs, cspecs = _specs(params, caches)
        dkey = ("decode", counts is None, adapter_ids is None,
                logit_bias is None, top_lp)
        if dkey not in state:
            samp_spec = {k: batch_spec for k in samp}
            # counts [B, V] / adapter_ids [B] / logit_bias [B, V] shard over
            # data with their slots.
            counts_spec = batch_spec if counts is None else P(*batch_spec, None)
            mask_spec = (
                batch_spec if logit_bias is None else P(*batch_spec, None)
            )
            out_core = [batch_spec, batch_spec]
            if top_lp:
                out_core += [batch_spec, batch_spec]  # tl vals/idx [B, K]
            out_core.append(counts_spec)

            @partial(
                _shard_map,
                mesh=mesh,
                in_specs=(pspecs, cspecs, batch_spec, batch_spec,
                          batch_spec, samp_spec, counts_spec, batch_spec,
                          mask_spec),
                out_specs=(tuple(out_core), cspecs),
                check_vma=False,
            )
            def _decode(params, caches, last_tokens, active, key, samp,
                        counts, adapter_ids, logit_bias):
                from .sampling import (
                    sample_batched,
                    token_logprob,
                    top_logprobs,
                )

                max_pos = model.cfg.max_position_embeddings - 1
                positions = jnp.minimum(caches[0].lengths, max_pos)[:, None]
                advance = active.astype(jnp.int32)
                logits, caches = model.apply(
                    params, last_tokens[:, None], positions, caches,
                    advance=advance, adapter_ids=adapter_ids,
                )
                key_r = key  # per-row [B_local, 2] keys shard with slots
                last = logits[:, -1]
                if logit_bias is not None:
                    last = last + logit_bias
                next_tokens = sample_batched(
                    last, key_r, samp["temps"], samp["top_ks"],
                    samp["top_ps"], samp["min_ps"], counts, penalty,
                    pres=samp.get("pres_pens"), freq=samp.get("freq_pens"),
                )
                logprobs = token_logprob(last, next_tokens)
                out = [next_tokens, logprobs]
                if top_lp:
                    out.extend(top_logprobs(last, top_lp))
                if counts is not None:
                    b = jnp.arange(next_tokens.shape[0])
                    counts = counts.at[b, next_tokens].add(
                        active.astype(jnp.int32)
                    )
                out.append(counts)
                return tuple(out), caches

            state[dkey] = jax.jit(_decode, donate_argnums=(1,))
        res, caches = state[dkey](
            params, caches, last_tokens, active, key, samp, counts,
            adapter_ids, logit_bias,
        )
        if top_lp:
            next_tokens, logprobs, tlv, tli, counts = res
            tl = (tlv, tli)
        else:
            (next_tokens, logprobs, counts), tl = res, None
        return next_tokens, logprobs, tl, counts, caches

    def extend_hidden(params, caches, tokens, true_len, slot, aid=None):
        """extend that also returns the chunk's final-norm hidden states
        (replicated out — pure-TP activations are already identical per
        device; under dp>1 the body psum-replicates the owner's chunk).
        Feeds the EAGLE feature draft's prefill."""
        pspecs, cspecs = _specs(params, caches)
        ekey = ("extend_hidden", aid is None)
        if ekey not in state:

            @partial(
                _shard_map,
                mesh=mesh,
                in_specs=(pspecs, cspecs, P(), P(), P(), P()),
                out_specs=(P(), P(), cspecs),
                check_vma=False,
            )
            def _extend(params, caches, tokens, true_len, slot, aid):
                return _extend_slot_body(
                    model, params, caches, tokens, true_len, slot,
                    data_axis=data_axis, return_hidden=True,
                    adapter_ids=aid,
                )

            state[ekey] = jax.jit(_extend, donate_argnums=(1,))
        return state[ekey](params, caches, tokens, true_len, slot, aid)

    def spec_score_hidden(params, caches, window, active, key, samp,
                          draft_logits, bias=None, want_logprobs=False,
                          counts=None, penalty=1.0, adapter_ids=None,
                          top_lp=0):
        """spec_score that also returns the hidden state at each slot's
        committed frontier (batch-sharded [B, D] — the EAGLE draft's
        next-tick true-feature anchors)."""
        pspecs, cspecs = _specs(params, caches)
        skey = ("spec_score_hidden", window.shape[1], bias is None,
                want_logprobs, counts is None, penalty,
                adapter_ids is None, top_lp)
        if skey not in state:
            samp_spec = {k: batch_spec for k in samp}
            counts_spec = (
                batch_spec if counts is None else P(*batch_spec, None)
            )
            outs = [batch_spec, batch_spec, batch_spec]
            if want_logprobs:
                outs.append(
                    (batch_spec,) * (2 + (2 if top_lp else 0))
                )

            @partial(
                _shard_map,
                mesh=mesh,
                in_specs=(pspecs, cspecs, batch_spec, batch_spec,
                          batch_spec, samp_spec, batch_spec, batch_spec,
                          counts_spec, batch_spec),
                out_specs=(tuple(outs), cspecs),
                check_vma=False,
            )
            def _score(params, caches, window, active, key, samp, dlogits,
                       bias, counts, aid):
                key_r = key  # per-row [B_local, 2] keys shard with slots
                *res, caches = _spec_score_and_accept_body(
                    model, params, caches, window, active, key_r, samp,
                    dlogits, bias, return_hidden=True,
                    want_logprobs=want_logprobs, counts=counts,
                    penalty=penalty, adapter_ids=aid, top_lp=top_lp,
                )
                return tuple(res), caches

            state[skey] = jax.jit(_score, donate_argnums=(1,))
        res, caches = state[skey](
            params, caches, window, active, key, samp, draft_logits, bias,
            counts, adapter_ids,
        )
        return (*res, caches)

    def spec_score(params, caches, window, active, key, samp, draft_logits,
                   bias=None, want_logprobs=False, counts=None,
                   penalty=1.0, adapter_ids=None, top_lp=0):
        """shard_map'd _spec_score_and_accept for speculative/prompt-lookup
        ticks on a TP-only mesh (dp>1 guarded at Engine init)."""
        pspecs, cspecs = _specs(params, caches)
        # Window width (gamma) can change under adaptive gamma; cache one
        # wrapped program per width.
        skey = ("spec_score", window.shape[1], draft_logits is None,
                bias is None, want_logprobs, counts is None, penalty,
                adapter_ids is None, top_lp)
        if skey not in state:
            samp_spec = {k: batch_spec for k in samp}
            dl_spec = batch_spec  # [B, g, V]; None pytree if prompt-lookup
            bias_spec = batch_spec  # [B, T, V] guided bias; None when off
            counts_spec = (
                batch_spec if counts is None else P(*batch_spec, None)
            )
            outs = [batch_spec, batch_spec]
            if want_logprobs:
                outs.append(
                    (batch_spec,) * (2 + (2 if top_lp else 0))
                )

            @partial(
                _shard_map,
                mesh=mesh,
                in_specs=(pspecs, cspecs, batch_spec, batch_spec,
                          batch_spec, samp_spec, dl_spec, bias_spec,
                          counts_spec, batch_spec),
                out_specs=(tuple(outs), cspecs),
                check_vma=False,
            )
            def _score(params, caches, window, active, key, samp, dlogits,
                       bias, counts, aid):
                key_r = key  # per-row [B_local, 2] keys shard with slots
                *res, caches = _spec_score_and_accept_body(
                    model, params, caches, window, active, key_r, samp,
                    dlogits, bias, want_logprobs=want_logprobs,
                    counts=counts, penalty=penalty, adapter_ids=aid,
                    top_lp=top_lp,
                )
                return tuple(res), caches

            state[skey] = jax.jit(_score, donate_argnums=(1,))
        res, caches = state[skey](
            params, caches, window, active, key, samp, draft_logits, bias,
            counts, adapter_ids,
        )
        return (*res, caches)

    def tree_score(params, caches, window, active, key, samp, branches,
                   depth, bias=None, counts=None, penalty=1.0,
                   want_logprobs=False, adapter_ids=None, top_lp=0):
        """shard_map'd _tree_score_and_accept (tree speculation on a mesh):
        window/outputs batch-sharded; the compaction (reorder_tail) runs on
        each replica's local cache shard."""
        pspecs, cspecs = _specs(params, caches)
        tkey = ("tree_score", branches, depth, bias is None,
                counts is None, penalty, want_logprobs, adapter_ids is None,
                top_lp)
        if tkey not in state:
            samp_spec = {k: batch_spec for k in samp}
            counts_spec = (
                batch_spec if counts is None else P(*batch_spec, None)
            )
            outs = [batch_spec, batch_spec, batch_spec]
            if want_logprobs:
                outs.append(
                    (batch_spec,) * (2 + (4 if top_lp else 0))
                )

            @partial(
                _shard_map,
                mesh=mesh,
                in_specs=(pspecs, cspecs, batch_spec, batch_spec,
                          batch_spec, samp_spec, batch_spec, counts_spec,
                          batch_spec),
                out_specs=(tuple(outs), cspecs),
                check_vma=False,
            )
            def _tscore(params, caches, window, active, key, samp, bias,
                        counts, aid):
                key_r = key  # per-row [B_local, 2] keys shard with slots
                *res, caches = _tree_score_and_accept_body(
                    model, params, caches, window, active, key_r, samp,
                    branches, depth, bias=bias, counts=counts,
                    penalty=penalty, want_logprobs=want_logprobs,
                    adapter_ids=aid, top_lp=top_lp,
                )
                return tuple(res), caches

            state[tkey] = jax.jit(_tscore, donate_argnums=(1,))
        res, caches = state[tkey](
            params, caches, window, active, key, samp, bias, counts,
            adapter_ids,
        )
        return (*res, caches)

    def tree_score_hidden(params, caches, window, active, key, samp,
                          branches, depth, bias=None, counts=None,
                          penalty=1.0, want_logprobs=False,
                          adapter_ids=None, top_lp=0):
        """shard_map'd _tree_score_and_accept_hidden (EAGLE-tree on a
        mesh): like tree_score, plus the batch-sharded [B, D] re-anchor
        hidden at each slot's last accepted node."""
        pspecs, cspecs = _specs(params, caches)
        tkey = ("tree_score_hidden", branches, depth, bias is None,
                counts is None, penalty, want_logprobs, adapter_ids is None,
                top_lp)
        if tkey not in state:
            samp_spec = {k: batch_spec for k in samp}
            counts_spec = (
                batch_spec if counts is None else P(*batch_spec, None)
            )
            outs = [batch_spec, batch_spec, batch_spec, batch_spec]
            if want_logprobs:
                outs.append(
                    (batch_spec,) * (2 + (4 if top_lp else 0))
                )

            @partial(
                _shard_map,
                mesh=mesh,
                in_specs=(pspecs, cspecs, batch_spec, batch_spec,
                          batch_spec, samp_spec, batch_spec, counts_spec,
                          batch_spec),
                out_specs=(tuple(outs), cspecs),
                check_vma=False,
            )
            def _tscore(params, caches, window, active, key, samp, bias,
                        counts, aid):
                key_r = key  # per-row [B_local, 2] keys shard with slots
                *res, caches = _tree_score_and_accept_body(
                    model, params, caches, window, active, key_r, samp,
                    branches, depth, bias=bias, counts=counts,
                    penalty=penalty, want_logprobs=want_logprobs,
                    adapter_ids=aid, top_lp=top_lp, return_hidden=True,
                )
                return tuple(res), caches

            state[tkey] = jax.jit(_tscore, donate_argnums=(1,))
        res, caches = state[tkey](
            params, caches, window, active, key, samp, bias, counts,
            adapter_ids,
        )
        return (*res, caches)

    def tree_score_heads(params, caches, window, active, key, samp, *,
                         branches, depth, heads, head_params, bias=None,
                         counts=None, penalty=1.0, want_logprobs=False,
                         adapter_ids=None, top_lp=0):
        """tree_score with trained drafting heads: also returns next-tick
        proposals [B, branches, depth] (batch-sharded like the window; head
        params replicate — the heads are tiny next to the base)."""
        pspecs, cspecs = _specs(params, caches)
        tkey = ("tree_score_heads", branches, depth, id(heads),
                bias is None, counts is None, penalty, want_logprobs,
                adapter_ids is None, top_lp)
        if tkey not in state:
            hspec = jax.tree_util.tree_map(lambda _: P(), head_params)
            samp_spec = {k: batch_spec for k in samp}
            counts_spec = (
                batch_spec if counts is None else P(*batch_spec, None)
            )
            outs = [batch_spec, batch_spec, batch_spec, batch_spec]
            if want_logprobs:
                outs.append(
                    (batch_spec,) * (2 + (4 if top_lp else 0))
                )

            @partial(
                _shard_map,
                mesh=mesh,
                in_specs=(pspecs, cspecs, hspec, batch_spec, batch_spec,
                          batch_spec, samp_spec, batch_spec, counts_spec,
                          batch_spec),
                out_specs=(tuple(outs), cspecs),
                check_vma=False,
            )
            def _tscore(params, caches, hp, window, active, key, samp,
                        bias, counts, aid):
                key_r = key  # per-row [B_local, 2] keys shard with slots
                *res, caches = _tree_score_and_accept_body(
                    model, params, caches, window, active, key_r, samp,
                    branches, depth, heads=heads, head_params=hp,
                    bias=bias, counts=counts, penalty=penalty,
                    want_logprobs=want_logprobs, adapter_ids=aid,
                    top_lp=top_lp,
                )
                return tuple(res), caches

            state[tkey] = jax.jit(_tscore, donate_argnums=(1,))
        res, caches = state[tkey](
            params, caches, head_params, window, active, key, samp, bias,
            counts, adapter_ids,
        )
        return (*res, caches)

    fns["extend"] = extend_with_adapters
    fns["decode"] = decode
    fns["spec_score"] = spec_score
    fns["extend_hidden"] = extend_hidden
    fns["spec_score_hidden"] = spec_score_hidden
    fns["tree_score"] = tree_score
    fns["tree_score_hidden"] = tree_score_hidden
    fns["tree_score_heads"] = tree_score_heads
    fns["state"] = state
    return fns


def _extend_slot_body(model, params, caches, tokens, true_len, slot,
                      data_axis=None, adapter_ids=None, return_hidden=False):
    """The un-jitted body of _extend_slot (shared with the mesh wrapper).

    ``data_axis``: inside shard_map with batch-sharded caches (dp>1), the
    global slot index resolves to (owning replica, local slot). Non-owner
    replicas run the identical program with advance=0 on a clamped local
    slot: their lengths never move, and their stray k/v writes land at or
    beyond their own tenant's frontier (positions >= its length), which the
    tenant's next real write overwrites before any masked read sees it."""
    b_local = caches[0].lengths.shape[0]
    if data_axis is not None:
        r = jax.lax.axis_index(data_axis)
        ls = slot - r * b_local
        owner = (ls >= 0) & (ls < b_local)
        ls = jnp.clip(ls, 0, b_local - 1)
        adv = jnp.where(owner, true_len, 0).astype(jnp.int32).reshape(1)
    else:
        owner = None
        ls = slot
        adv = jnp.full((1,), true_len, jnp.int32)
    sub = [c.slot_view(ls) for c in caches]
    Tpad = tokens.shape[1]
    start = sub[0].lengths[0]
    positions = start + jnp.arange(Tpad)[None, :]
    max_pos = model.cfg.max_position_embeddings - 1
    positions = jnp.minimum(positions, max_pos)
    if return_hidden:
        logits, sub, hidden = model.apply(
            params, tokens, positions, sub, advance=adv,
            adapter_ids=adapter_ids, return_hidden=True,
        )
    else:
        logits, sub = model.apply(
            params, tokens, positions, sub, advance=adv,
            adapter_ids=adapter_ids,
        )
    new_caches = [big.merge_slot(small, ls) for big, small in zip(caches, sub)]
    out_logits = logits[0, true_len - 1]
    if data_axis is not None:
        # Only the owner computed the real logits; make them replicated.
        out_logits = jax.lax.psum(
            jnp.where(owner, out_logits, jnp.zeros_like(out_logits)), data_axis
        )
    if return_hidden:
        hidden = hidden.astype(jnp.float32)
        if data_axis is not None:
            # Same owner-masked psum: non-owner replicas prefilled a junk
            # local slot — replicate the owner's hidden chunk (the EAGLE
            # feature stream) exactly like the logits above.
            hidden = jax.lax.psum(
                jnp.where(owner, hidden, jnp.zeros_like(hidden)), data_axis
            )
        return out_logits, hidden, new_caches
    return out_logits, new_caches
