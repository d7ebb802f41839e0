"""Llama-family decoder, TPU-native, with all projections through QLinear.

The reference never defines a model — its users swap linears inside their own
torch models (SURVEY.md §1.3). Here the model tier is first-class (component
A5): RMSNorm + RoPE + GQA attention + SwiGLU MLP, every projection a
``QLinear`` in mode "dynamic" / "weight_only" / "fp", bf16 activations,
functional KV cache threaded through the call (pure dataflow — jit/pjit
shard it like any other pytree).

ModelConfig.tiny() is acceptance config 2 (2-layer d=512 toy transformer);
llama2_7b / llama2_70b match the HF architecture configs.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.qlinear import QLinear
from ..utils.config import ModelConfig
from .kv_cache import BF16KVCache, Int8KVCache


def init_cache(
    cfg: ModelConfig, batch: int, max_seq: int, kv_dtype=jnp.bfloat16, tp: int = 1
) -> list:
    """Per-layer KV caches. kv_dtype in {jnp.bfloat16, jnp.float32, jnp.int8};
    int8 selects the quantized cache (component A1). Under tensor parallelism
    each shard holds kv_heads/tp heads (pass tp when building *local* caches
    inside shard_map; global caches sharded by pjit use tp=1 shapes)."""
    if cfg.is_mla:
        # MLA latent caches (models/mla.py): MQA-shared latents, so the
        # cache replicates under TP (tp is irrelevant to its shape).
        from .mla import init_mla_cache

        return init_mla_cache(cfg, batch, max_seq, kv_dtype)
    kv_heads = cfg.num_key_value_heads // tp
    if isinstance(kv_dtype, str) and kv_dtype == "k8v4":
        # Mixed tier: int8 keys + packed-int4 values (6 bits/elem average;
        # full-causal only). DEMOTED round 5: dominated by "k4v8" below
        # (BASELINE.md ladder decisions 2 and 5) — kept as the V-per-token
        # reference layout.
        from .kv_cache import MixedKVCache

        make = lambda: MixedKVCache.init(batch, max_seq, kv_heads, cfg.head_dim)
    elif isinstance(kv_dtype, str) and kv_dtype == "k4v8":
        # The DOMINANT 6-bit mixed tier (round 5): KIVI-chunked int4 K
        # (+ int8 tail) x per-token int8 V — int8-class quality at 3/4 the
        # bytes; full windowed/softcap/sink variant surface.
        from .kv_cache import K4V8KVCache

        make = lambda: K4V8KVCache.init(batch, max_seq, kv_heads, cfg.head_dim)
    elif kv_dtype == jnp.int4:
        # Packed-nibble cache (quarter of bf16 bytes; full-causal only).
        from .kv_cache import Int4KVCache

        make = lambda: Int4KVCache.init(batch, max_seq, kv_heads, cfg.head_dim)
    elif kv_dtype == jnp.int8:
        make = lambda: Int8KVCache.init(batch, max_seq, kv_heads, cfg.head_dim)
    else:
        make = lambda: BF16KVCache.init(
            batch, max_seq, kv_heads, cfg.head_dim, kv_dtype
        )
    return [make() for _ in range(cfg.num_hidden_layers)]


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def alibi_slopes(n_heads: int):
    """Canonical ALiBi head slopes (Press et al. 2021, the BLOOM/MPT
    scheme): for 2^k heads a geometric sequence 2^(-8i/n); other counts
    take the closest power of two's sequence plus every other entry of the
    doubled one (the transformers build_alibi_tensor recipe)."""
    import math

    import numpy as _np

    def pow2(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start ** (i + 1) for i in range(n)]

    if math.log2(n_heads).is_integer():
        return _np.asarray(pow2(n_heads), _np.float32)
    c = 2 ** math.floor(math.log2(n_heads))
    return _np.asarray(
        pow2(c) + pow2(2 * c)[0::2][: n_heads - c], _np.float32
    )


class RMSNorm(nn.Module):
    eps: float = 1e-5
    dtype: Any = jnp.bfloat16
    # Gemma stores norm weights zero-centred and applies (1 + w); the init
    # flips to zeros so a fresh fp model is identity-normed either way.
    unit_offset: bool = False
    # quant_out: emit (xq int8, s_x f32) via the fused norm+rowquant Pallas
    # kernel instead of the normed bf16 activation — one HBM pass instead of
    # three when the consumer is a dynamic-int8 projection (ops/fused_quant).
    quant_out: bool = False
    # Sharded full-width normalization (OLMo-2 qk-norm under TP): the
    # logical norm width is shards * local width — the variance psums over
    # ``psum_axis`` and the weight param covers the FULL width (replicated;
    # each rank slices its contiguous block, matching Megatron's contiguous
    # column split of the producing projection).
    psum_axis: str | None = None
    shards: int = 1

    @nn.compact
    def __call__(self, x):
        init = (
            nn.initializers.zeros_init()
            if self.unit_offset
            else nn.initializers.ones_init()
        )
        local = x.shape[-1]
        w = self.param("weight", init, (local * self.shards,), jnp.float32)
        if self.shards > 1:
            idx = jax.lax.axis_index(self.psum_axis)
            w = jax.lax.dynamic_slice(w, (idx * local,), (local,))
        if self.unit_offset:
            w = w + 1.0
        if self.quant_out:
            from ..ops.fused_quant import rms_norm_quant

            return rms_norm_quant(x, w, eps=self.eps, cast_dtype=self.dtype)
        xf = x.astype(jnp.float32)
        if self.shards > 1:
            ss = jnp.sum(xf * xf, axis=-1, keepdims=True)
            var = jax.lax.psum(ss, self.psum_axis) / (local * self.shards)
        else:
            var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(var + self.eps)
        return (y * w).astype(self.dtype)


def _act_fn(hidden_act: str):
    """silu | gelu (tanh approximation — HF gelu_pytorch_tanh/gelu_new:
    Gemma, GPT-2, StarCoder2) | gelu_exact (erf — HF plain F.gelu:
    GPT-NeoX/Pythia, Falcon)."""
    if hidden_act == "silu":
        return jax.nn.silu
    if hidden_act == "gelu_exact":
        return partial(jax.nn.gelu, approximate=False)
    return partial(jax.nn.gelu, approximate=True)



class LayerNorm(nn.Module):
    """Mean-centred norm with weight + bias (GPT-NeoX/Pythia tier; fp32
    math, output cast to the activation dtype like RMSNorm above)."""

    eps: float = 1e-5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight", nn.initializers.ones_init(), (x.shape[-1],), jnp.float32
        )
        b = self.param(
            "bias", nn.initializers.zeros_init(), (x.shape[-1],), jnp.float32
        )
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + self.eps)
        return (y * w + b).astype(self.dtype)


def make_norm(cfg, dtype, name, quant_out=False):
    """The model-wide norm family switch (cfg.norm_type)."""
    if cfg.norm_type == "layernorm":
        assert not quant_out, "fused norm+quant is RMSNorm-only"
        return LayerNorm(cfg.rms_norm_eps, dtype, name=name)
    return RMSNorm(
        cfg.rms_norm_eps, dtype, unit_offset=cfg.rmsnorm_unit_offset,
        quant_out=quant_out, name=name,
    )


def rope_tables(head_dim: int, max_len: int, theta: float, cfg=None,
                longrope_long: bool = False):
    """cos/sin tables [max_len, head_dim//2], f32.

    ``cfg`` (ModelConfig) enables RoPE scaling: "linear" position
    interpolation (inv_freq / factor), Llama-3.1's NTK-by-parts rule —
    low-frequency components interpolate by ``factor``, high-frequency ones
    stay extrapolated, with a smooth blend between the two wavelength bands —
    or "yarn" (DeepSeek long-context: ramped interpolation between the
    beta_fast/beta_slow correction dims plus an attention_factor multiplied
    into cos/sin). All pinned against transformers' modeling_rope_utils in
    tests/test_hf_parity.py."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    if cfg is not None and cfg.rope_scaling_type == "linear":
        inv_freq = inv_freq / cfg.rope_scaling_factor
    elif cfg is not None and cfg.rope_scaling_type == "longrope":
        # Phi-3: per-dim inv_freq divisors; the short/long choice is the
        # caller's (Attention selects at runtime from the live positions).
        ext = jnp.asarray(
            cfg.rope_scaling_long_factor if longrope_long
            else cfg.rope_scaling_short_factor,
            jnp.float32,
        )
        inv_freq = inv_freq / ext
    elif cfg is not None and cfg.rope_scaling_type == "yarn":
        import math

        factor = cfg.rope_scaling_factor
        orig = cfg.rope_scaling_original_max_position_embeddings

        def corr_dim(n_rot):
            # Dimension whose wavelength completes n_rot rotations at orig.
            return (
                head_dim
                * math.log(orig / (n_rot * 2 * math.pi))
                / (2 * math.log(theta))
            )

        lo_raw = corr_dim(cfg.rope_scaling_beta_fast)
        hi_raw = corr_dim(cfg.rope_scaling_beta_slow)
        if cfg.rope_scaling_truncate:
            lo_raw, hi_raw = math.floor(lo_raw), math.ceil(hi_raw)
        low = max(lo_raw, 0)
        high = min(hi_raw, head_dim - 1)
        if low == high:
            high += 0.001  # transformers' singularity guard
        ramp = jnp.clip(
            (jnp.arange(head_dim // 2, dtype=jnp.float32) - low) / (high - low),
            0.0,
            1.0,
        )
        extrap = 1.0 - ramp  # 1 = keep extrapolated, 0 = interpolate
        inv_freq = (inv_freq / factor) * (1.0 - extrap) + inv_freq * extrap
    elif cfg is not None and cfg.rope_scaling_type == "llama3":
        factor = cfg.rope_scaling_factor
        lo_f = cfg.rope_scaling_low_freq_factor
        hi_f = cfg.rope_scaling_high_freq_factor
        orig = cfg.rope_scaling_original_max_position_embeddings
        wavelen = 2.0 * jnp.pi / inv_freq
        smooth = (orig / wavelen - lo_f) / (hi_f - lo_f)
        blended = (1.0 - smooth) * inv_freq / factor + smooth * inv_freq
        inv_freq = jnp.where(
            wavelen < orig / hi_f,  # high-frequency band: extrapolate
            inv_freq,
            jnp.where(wavelen > orig / lo_f, inv_freq / factor, blended),
        )
    t = jnp.arange(max_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)
    cos, sin = jnp.cos(freqs), jnp.sin(freqs)
    if cfg is not None and cfg.rope_scaling_type == "yarn":
        cos = cos * yarn_attention_factor(cfg)
        sin = sin * yarn_attention_factor(cfg)
    elif cfg is not None and cfg.rope_scaling_type == "longrope":
        f = longrope_attention_factor(cfg)
        cos, sin = cos * f, sin * f
    return cos, sin


def longrope_attention_factor(cfg) -> float:
    """Phi-3 longrope magnitude correction: sqrt(1 + ln(s)/ln(orig)) with
    s = max_position_embeddings / original_max_position_embeddings (applied
    to BOTH factor tables; transformers _compute_longrope_parameters)."""
    import math

    orig = cfg.rope_scaling_original_max_position_embeddings
    s = cfg.max_position_embeddings / orig
    if s <= 1.0:
        return 1.0
    return math.sqrt(1.0 + math.log(s) / math.log(orig))


def yarn_mscale(scale: float, mscale: float = 1.0) -> float:
    """YaRN attention-magnitude correction (paper eq. for sqrt(1/t))."""
    import math

    if scale <= 1.0:
        return 1.0
    return 0.1 * mscale * math.log(scale) + 1.0


def yarn_attention_factor(cfg) -> float:
    """Multiplier on cos/sin under yarn scaling (transformers'
    _compute_yarn_parameters attention_factor inference)."""
    f = cfg.rope_scaling_factor
    m, mad = cfg.rope_scaling_mscale, cfg.rope_scaling_mscale_all_dim
    if m and mad:
        return yarn_mscale(f, m) / yarn_mscale(f, mad)
    return yarn_mscale(f)


def apply_rope(x: jnp.ndarray, positions: jnp.ndarray, cos, sin,
               rot: int | None = None):
    """x: [B, T, H, D]; positions: [B, T] absolute positions.

    ``rot`` < D applies partial rotary (Phi-3-small/GLM): the first rot dims
    rotate (half-split pairing within them), the rest pass through."""
    if rot is not None and rot < x.shape[-1]:
        xr, xp = x[..., :rot], x[..., rot:]
        return jnp.concatenate(
            [apply_rope(xr, positions, cos, sin), xp], axis=-1
        )
    c = cos[positions][:, :, None, :]  # [B, T, 1, D/2]
    s = sin[positions][:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.astype(x.dtype)


def _sp_gather_quantized(x, axis, dtype):
    """SP boundary, dynamic mode: quantize the LOCAL token shard, then
    all_gather int8 payload + f32 per-token scales — half the ICI bytes of a
    bf16 gather (SURVEY.md §2.2 SP row: "gather int8 activations").

    Exactness: rowquant scales are per-token over the K axis, so
    quantize-then-gather is bit-identical to gather-then-quantize.

    Returns (x_full, (xq, s_x)): x_full is the dequantized gathered
    activation — downstream dynamic-mode projections consume only the
    prequantized pair, so XLA dead-code-eliminates x_full unless a non-quant
    consumer appears."""
    from .. import ops

    xq, s_x = ops.shared_rowquant(x.astype(dtype))
    xq = jax.lax.all_gather(xq, axis, axis=1, tiled=True)
    s_x = jax.lax.all_gather(s_x, axis, axis=1, tiled=True)
    x_full = (xq.astype(jnp.float32) * s_x[..., None]).astype(dtype)
    return x_full, (xq, s_x)


class Attention(nn.Module):
    cfg: ModelConfig
    mode: str
    dtype: Any = jnp.bfloat16
    layer_idx: int = 0  # alternating sliding window (Gemma-2) keys off this
    tp: int = 1  # tensor-parallel degree: heads are sharded tp-ways
    tp_axis: Any = None  # mesh axis name (inside shard_map) for collectives
    fused: bool = False  # single fused QKV / gate-up matmuls (tp=1 only)
    sp: bool = False  # sequence parallelism: x arrives token-sharded
    cp: int = 1  # context parallelism (ring attention over a seq-sharded axis)
    cp_axis: Any = None
    int4_group: int = 128
    int4_storage: str = "packed"
    fp8_group: int = 0
    # LoRA adapters (nn/lora.py): rank 0 = off; targets = projection names
    # that carry an adapter (fused layers use their fused names).
    lora_rank: int = 0
    lora_alpha: float = 16.0
    lora_targets: tuple = ("q_proj", "k_proj", "v_proj", "o_proj")
    lora_stack: int = 0  # multi-LoRA: stacked adapter count (0 = single)
    collective: bool = False  # overlapped ring collective matmul for o_proj

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, T, D] (a dequantized stub when preq is given)
        positions: jnp.ndarray,  # [B, T]
        cache,  # BF16KVCache | Int8KVCache | None
        advance=None,  # [B] per-slot length increment override (engine)
        preq=None,  # optional (xq int8, s_x) from a fused norm+quant producer
        adapter_ids=None,  # [B] int32 multi-LoRA adapter selection
        tree_mask=None,  # [T, T] candidate-tree ancestor mask (spec scoring)
    ):
        cfg = self.cfg
        if self.sp:
            # SP: x is token-sharded [B, T/tp, D]; gather the full sequence
            # for the projections. Dynamic mode quantizes BEFORE the gather
            # so the wire carries int8 + per-token scales (half the bytes).
            if self.mode == "dynamic":
                x, preq = _sp_gather_quantized(x, self.tp_axis, self.dtype)
            else:
                x = jax.lax.all_gather(x, self.tp_axis, axis=1, tiled=True)
        B, T, _ = x.shape
        # Column-parallel Q/K/V: each shard owns H/tp query heads and KV/tp
        # kv heads (Megatron-style head sharding; SURVEY.md §2.2).
        H = cfg.num_attention_heads // self.tp
        KV = cfg.num_key_value_heads // self.tp
        Dh = cfg.head_dim
        # q/k/v carry biases in the Qwen2 family (o_proj never does); the
        # bias rides the kernels' fused fp32 epilogue, so the int8 path is
        # unchanged.
        _lr = lambda n: self.lora_rank if n in self.lora_targets else 0
        lin = lambda feats, name: QLinear(
            feats, mode=self.mode, use_bias=cfg.attention_bias,
            dtype=self.dtype,
            int4_group=self.int4_group, int4_storage=self.int4_storage, fp8_group=self.fp8_group,
            lora_rank=_lr(name), lora_alpha=self.lora_alpha,
            lora_stack=self.lora_stack, name=name,
        )

        # Shared dynamic rowquant: q/k/v read the same normed activation, so
        # quantize it once and feed all three int8 matmuls (unless the SP
        # gather above already produced the quantized pair).
        if self.mode in ("dynamic", "dynamic_int4") and preq is None:
            from .. import ops

            preq = ops.shared_rowquant(x.astype(self.dtype))

        if self.fused:
            # One fused QKV matmul: exact — per-output-channel scales just
            # concatenate along N (params pre-fused by nn.fuse_projections).
            assert self.tp == 1, "fused QKV requires tp=1"
            qkv = lin((H + 2 * KV) * Dh, "qkv_proj")(x, preq, adapter_ids)
            q, k, v = jnp.split(qkv, [H * Dh, (H + KV) * Dh], axis=-1)
            q = q.reshape(B, T, H, Dh)
            k = k.reshape(B, T, KV, Dh)
            v = v.reshape(B, T, KV, Dh)
        else:
            q = lin(H * Dh, "q_proj")(x, preq, adapter_ids).reshape(B, T, H, Dh)
            k = lin(KV * Dh, "k_proj")(x, preq, adapter_ids).reshape(B, T, KV, Dh)
            v = lin(KV * Dh, "v_proj")(x, preq, adapter_ids).reshape(B, T, KV, Dh)

        if cfg.qk_norm and cfg.qk_norm_full:
            # OLMo-2: RMSNorm over the FULL projection width (mean over
            # H*Dh, weight [H*Dh]), before the head split. Under TP the
            # variance psums across head shards and each rank slices its
            # block of the replicated full-width weight (RMSNorm shards=tp
            # — round-4 guard lift, exact-match tested).
            ax = self.tp_axis if self.tp > 1 else None
            q = RMSNorm(cfg.rms_norm_eps, self.dtype,
                        unit_offset=cfg.rmsnorm_unit_offset,
                        psum_axis=ax, shards=self.tp, name="q_norm")(
                q.reshape(B, T, H * Dh)
            ).reshape(B, T, H, Dh)
            k = RMSNorm(cfg.rms_norm_eps, self.dtype,
                        unit_offset=cfg.rmsnorm_unit_offset,
                        psum_axis=ax, shards=self.tp, name="k_norm")(
                k.reshape(B, T, KV * Dh)
            ).reshape(B, T, KV, Dh)
        elif cfg.qk_norm:
            # Qwen3 / Gemma-3: per-head RMSNorm over head_dim on q and k,
            # pre-RoPE (Gemma-3 stores these zero-centred like its other
            # norms — unit_offset follows the family flag).
            q = RMSNorm(cfg.rms_norm_eps, self.dtype,
                        unit_offset=cfg.rmsnorm_unit_offset, name="q_norm")(q)
            k = RMSNorm(cfg.rms_norm_eps, self.dtype,
                        unit_offset=cfg.rmsnorm_unit_offset, name="k_norm")(k)

        # Per-layer attention variants: Gemma-2 applies the sliding window
        # on even layers only (pattern 2); Gemma-3 makes every Nth layer
        # global (pattern N) and gives sliding layers their own UNSCALED
        # rope base (rope_local_theta). Gemma-2 additionally scales scores
        # by query_pre_attn_scalar^-0.5 and soft-caps the logits. All of
        # these run the flash kernel on TPU (windowed variant block-skips,
        # so decode reads O(window) cache bytes); dense/ring routing lives
        # in Int8KVCache/RingInt8KVCache.update_and_attend.
        pattern = cfg.sliding_window_pattern or (
            2 if cfg.alternating_sliding_window else 0
        )
        is_sliding = cfg.sliding_window > 0 and (
            pattern == 0 or bool((self.layer_idx + 1) % pattern)
        )
        win = cfg.sliding_window if is_sliding else 0

        # Partial rotary (Phi-3-small/GLM): rope the first rot dims only.
        # rot must be even: apply_rope splits the rotated slice in half and
        # the rope tables are rot//2 wide (a fractional factor × odd Dh can
        # otherwise yield an odd rot).
        rot = (
            Dh if cfg.partial_rotary_factor >= 1.0
            else int(Dh * cfg.partial_rotary_factor) // 2 * 2
        )
        if cfg.position_embedding in ("learned", "alibi"):
            # GPT-2-class learned positions / BLOOM-class alibi biases:
            # attention is rope-free.
            pass
        elif cfg.rope_local_theta > 0.0 and is_sliding:
            cos, sin = rope_tables(
                rot, cfg.max_position_embeddings, cfg.rope_local_theta, None
            )
        elif cfg.rope_scaling_type == "longrope":
            # Phi-3: short factors while every position fits the original
            # training window, long factors beyond — selected at runtime
            # from the live positions (transformers' dynamic rope update
            # recomputes per forward from max(position_ids)+1).
            cs, ss = rope_tables(
                rot, cfg.max_position_embeddings, cfg.rope_theta, cfg,
                longrope_long=False,
            )
            cl, sl = rope_tables(
                rot, cfg.max_position_embeddings, cfg.rope_theta, cfg,
                longrope_long=True,
            )
            is_long = (
                jnp.max(positions) + 1
                > cfg.rope_scaling_original_max_position_embeddings
            )
            cos = jnp.where(is_long, cl, cs)
            sin = jnp.where(is_long, sl, ss)
        else:
            cos, sin = rope_tables(
                rot, cfg.max_position_embeddings, cfg.rope_theta, cfg
            )
        if cfg.position_embedding not in ("learned", "alibi"):
            if cfg.rope_interleave:
                # Cohere Command-R pairing: (even, odd) dims rotate
                # together (the DeepSeek/MLA convention — shared helper).
                from .mla import apply_rope_interleaved

                assert rot == Dh, "interleaved rope is full-dim only"
                q = apply_rope_interleaved(q, positions, cos, sin)
                k = apply_rope_interleaved(k, positions, cos, sin)
            else:
                q = apply_rope(q, positions, cos, sin, rot=rot)
                k = apply_rope(k, positions, cos, sin, rot=rot)
        alibi = None
        if cfg.position_embedding == "alibi":
            # Per-head linear distance biases on the logits; under TP each
            # rank takes its contiguous slice of the canonical slopes
            # (heads split contiguously like the qkv columns).
            full = jnp.asarray(alibi_slopes(cfg.num_attention_heads))
            if self.tp > 1:
                r = jax.lax.axis_index(self.tp_axis)
                alibi = jax.lax.dynamic_slice(full, (r * H,), (H,))
            else:
                alibi = full
        scale = (
            cfg.query_pre_attn_scalar**-0.5
            if cfg.query_pre_attn_scalar > 0.0
            else 0.0
        )
        softcap = cfg.attn_logit_softcap
        # GPT-OSS learned sinks: a trainable per-head logit that joins every
        # softmax (mha_attention._softmax_with_sinks). Sharded over heads
        # under TP, like the head dimension it indexes.
        sinks = (
            self.param(
                "sinks", nn.initializers.zeros_init(), (H,), jnp.float32
            )
            if cfg.learned_attention_sinks
            else None
        )
        if cache is not None:
            # Cache classes own update + masking + (for int8) the Pallas
            # in-kernel-dequant attention.
            kw = {} if sinks is None else {"sink_logits": sinks}
            if alibi is not None:
                kw["alibi_slopes"] = alibi
            if tree_mask is not None:
                # Tree + sliding window composes (round 4): the ancestor
                # relation replaces in-window causality and the window's
                # lower bound uses depth-based query positions — provided
                # the window clears the whole tree (in-window nodes must
                # never fall behind any node's lower bound).
                assert win == 0 or win > tree_mask.shape[0], (
                    "tree speculation needs sliding_window > tree width "
                    f"({win} <= {tree_mask.shape[0]})"
                )
                kw["tree_mask"] = tree_mask
            out, new_cache = cache.update_and_attend(
                q, k, v, advance, window=win, scale=scale, softcap=softcap,
                **kw,
            )
        elif self.cp_axis is not None:
            # Context parallelism: tokens (and their q/k/v) are seq-sharded;
            # KV blocks rotate around the ring while each shard accumulates
            # online-softmax partials (parallel/context.py).
            from ..parallel.context import ring_attention

            assert win == 0 and softcap == 0.0 and scale == 0.0 and sinks is None, (
                "CP + sliding window / softcap / custom scaling / learned "
                "sinks unsupported"
            )
            new_cache = None
            out = ring_attention(q, k, v, positions, self.cp_axis, self.cp)
        else:
            new_cache = None
            out = mha_attention(
                q, k, v, positions, positions, window=win, scale=scale,
                softcap=softcap, sink_logits=sinks, alibi_slopes=alibi,
            )

        out = out.reshape(B, T, H * Dh)
        # Row-parallel output projection: all-reduce, or reduce-scatter back
        # to the token-sharded layout under SP.
        o = QLinear(
            cfg.hidden_size,
            mode=self.mode,
            use_bias=cfg.attention_out_bias,
            dtype=self.dtype,
            psum_axis=self.tp_axis,
            scatter_tokens=self.sp,
            int4_group=self.int4_group,
            int4_storage=self.int4_storage, fp8_group=self.fp8_group,
            lora_rank=_lr("o_proj"),
            lora_alpha=self.lora_alpha,
            lora_stack=self.lora_stack,
            collective=self.collective,
            tp=self.tp,
            name="o_proj",
        )(out, None, adapter_ids)
        return o, new_cache


def mha_attention(q, k, v, q_positions, k_positions, window: int = 0,
                  scale: float = 0.0, softcap: float = 0.0,
                  sink_logits=None, tree_mask=None, alibi_slopes=None):
    """Grouped-query attention with absolute-position causal masking.

    q: [B, T, H, Dh]; k/v: [B, S, KV, Dh]; q_positions [B, T];
    k_positions [B or 1, S]. Slots with k_pos > q_pos are masked, which also
    hides unwritten cache slots (their k_pos exceeds every live query).
    ``window`` > 0 adds Mistral-style sliding-window masking: a query also
    ignores keys more than window-1 positions behind it.
    ``scale`` overrides the head_dim^-0.5 score scaling (Gemma-2's
    query_pre_attn_scalar^-0.5); ``softcap`` > 0 applies Gemma-2's pre-mask
    logit soft-capping cap*tanh(s/cap).
    ``sink_logits`` [H]: GPT-OSS learned attention sinks — one trainable
    logit per head joins every softmax and its probability mass is dropped,
    so heads can attend "nowhere".
    """
    B, T, H, Dh = q.shape
    KV = k.shape[2]
    group = H // KV
    qf = q.reshape(B, T, KV, group, Dh).astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    sm = scale if scale > 0.0 else Dh**-0.5
    scores = jnp.einsum("btkgd,bskd->bkgts", qf, kf) * sm
    if alibi_slopes is not None:
        # ALiBi (BLOOM/MPT): logits pick up -slope_h * (q_pos - k_pos) —
        # nothing position-dependent touches q/k themselves (rope-free).
        dist = (
            q_positions[:, :, None] - k_positions[:, None, :]
        ).astype(jnp.float32)  # [B, T, S]
        sl = alibi_slopes.reshape(KV, group)
        scores = scores - sl[None, :, :, None, None] * dist[:, None, None]
    if softcap > 0.0:
        scores = softcap * jnp.tanh(scores / softcap)
    mask = k_positions[:, None, None, None, :] <= q_positions[:, None, None, :, None]
    if tree_mask is not None:
        # Tree speculation: queries are candidate-tree nodes whose K/V were
        # written at key slots q_positions[:, 0] + node_index; replace the
        # in-window causal relation with the ancestor relation (see
        # ops/attention.py int8_kv_attention_xla for the full story).
        base = q_positions[:, :1]  # [B, 1] frontier (root depth 0)
        j = k_positions - base  # [B, S]
        in_win = (j >= 0) & (j < tree_mask.shape[1])
        tm = jnp.take(
            tree_mask, jnp.clip(j, 0, tree_mask.shape[1] - 1), axis=1
        )
        tm = jnp.transpose(tm, (1, 0, 2))  # [B, T, S]
        mask = jnp.where(
            in_win[:, None, None, None, :], tm[:, None, None, :, :], mask
        )
    if window > 0:
        mask &= (
            k_positions[:, None, None, None, :]
            > q_positions[:, None, None, :, None] - window
        )
    scores = jnp.where(mask, scores, -1e30)
    probs = _softmax_with_sinks(scores, sink_logits, KV, group)
    out = jnp.einsum("bkgts,bskd->btkgd", probs, vf)
    return out.reshape(B, T, H, Dh).astype(q.dtype)


def _softmax_with_sinks(scores, sink_logits, KV: int, group: int):
    """Softmax over the key axis of [B, KV, G, T, S] scores, optionally
    joined by a per-head sink logit whose probability is discarded — the
    remaining probs sum to < 1 (GPT-OSS semantics)."""
    if sink_logits is None:
        return jax.nn.softmax(scores, axis=-1)
    s = sink_logits.astype(jnp.float32).reshape(1, KV, group, 1, 1)
    sink_col = jnp.broadcast_to(s, scores.shape[:-1] + (1,))
    combined = jnp.concatenate([scores, sink_col], axis=-1)
    return jax.nn.softmax(combined, axis=-1)[..., :-1]


class MLP(nn.Module):
    cfg: ModelConfig
    mode: str
    dtype: Any = jnp.bfloat16
    tp: int = 1
    tp_axis: Any = None
    fused: bool = False
    sp: bool = False
    int4_group: int = 128
    int4_storage: str = "packed"
    fp8_group: int = 0
    # LoRA adapters (nn/lora.py): rank 0 = off; targets = projection names
    # that carry an adapter (fused layers use their fused names).
    lora_rank: int = 0
    lora_alpha: float = 16.0
    lora_targets: tuple = ("q_proj", "k_proj", "v_proj", "o_proj")
    lora_stack: int = 0  # multi-LoRA: stacked adapter count (0 = single)
    collective: bool = False  # overlapped ring collective matmul for down_proj

    @nn.compact
    def __call__(self, x, preq=None, adapter_ids=None):
        if self.sp:
            # Dynamic mode: int8-on-the-wire gather (see _sp_gather_quantized).
            if self.mode == "dynamic":
                x, preq = _sp_gather_quantized(x, self.tp_axis, self.dtype)
            else:
                x = jax.lax.all_gather(x, self.tp_axis, axis=1, tiled=True)
        _lr = lambda n: self.lora_rank if n in self.lora_targets else 0
        bias = self.cfg.mlp_bias
        lin = lambda feats, name: QLinear(
            feats, mode=self.mode, use_bias=bias, dtype=self.dtype,
            int4_group=self.int4_group, int4_storage=self.int4_storage, fp8_group=self.fp8_group,
            lora_rank=_lr(name), lora_alpha=self.lora_alpha,
            lora_stack=self.lora_stack, name=name,
        )
        inter = self.cfg.intermediate_size // self.tp  # column-parallel
        if self.mode in ("dynamic", "dynamic_int4") and preq is None:
            from .. import ops

            preq = ops.shared_rowquant(x.astype(self.dtype))
        if not self.cfg.mlp_gated:
            # Plain 2-layer MLP (GPT-NeoX: dense_h_to_4h -> act ->
            # dense_4h_to_h; imported as up_proj/down_proj).
            assert not self.fused, "fused projections presume a gated MLP"
            up = lin(inter, "up_proj")(x, preq, adapter_ids)
            act = _act_fn(self.cfg.hidden_act)
            h = act(up.astype(jnp.float32)).astype(self.dtype)
            return QLinear(
                self.cfg.hidden_size,
                mode=self.mode,
                use_bias=bias,
                dtype=self.dtype,
                psum_axis=self.tp_axis,
                scatter_tokens=self.sp,
                int4_group=self.int4_group,
                int4_storage=self.int4_storage, fp8_group=self.fp8_group,
                lora_rank=_lr("down_proj"),
                lora_alpha=self.lora_alpha,
                lora_stack=self.lora_stack,
                collective=self.collective,
                tp=self.tp,
                name="down_proj",
            )(h, None, adapter_ids)
        if self.fused:
            assert self.tp == 1, "fused gate/up requires tp=1"
            gu = lin(2 * inter, "gate_up_proj")(x, preq, adapter_ids)
            gate, up = jnp.split(gu, [inter], axis=-1)
        else:
            gate = lin(inter, "gate_proj")(x, preq, adapter_ids)
            up = lin(inter, "up_proj")(x, preq, adapter_ids)
        # SwiGLU (Llama: silu) or GeGLU (Gemma: tanh-approx gelu) gate.
        from .. import ops

        down_preq = None
        # SP is excluded to mirror DecoderLayer's gating (SP regions quantize
        # at the gather boundary instead).
        if (self.mode == "dynamic" and not self.collective and not self.sp
                and ops.resolve_fused_quant()):
            # Fused act-gate-multiply + rowquant: one HBM pass over gate/up
            # instead of three over the intermediate (ops/fused_quant.py).
            from ..ops.fused_quant import swiglu_quant

            hq, sh = swiglu_quant(
                gate, up,
                act="silu" if self.cfg.hidden_act == "silu" else "gelu",
                cast_dtype=self.dtype,
            )
            down_preq = (hq, sh)
            # Dequantized stub: QLinear's dynamic path consumes down_preq
            # and XLA dead-code-eliminates this reconstruction.
            h = (hq.astype(jnp.float32) * sh[..., None]).astype(self.dtype)
        else:
            act = _act_fn(self.cfg.hidden_act)
            h = act(gate.astype(jnp.float32)).astype(self.dtype) * up
        # Row-parallel down projection: all-reduce (or reduce-scatter under SP).
        return QLinear(
            self.cfg.hidden_size,
            mode=self.mode,
            use_bias=bias,
            dtype=self.dtype,
            psum_axis=self.tp_axis,
            scatter_tokens=self.sp,
            int4_group=self.int4_group,
            int4_storage=self.int4_storage, fp8_group=self.fp8_group,
            lora_rank=_lr("down_proj"),
            lora_alpha=self.lora_alpha,
            lora_stack=self.lora_stack,
            collective=self.collective,
            tp=self.tp,
            name="down_proj",
        )(h, down_preq, adapter_ids)


class DecoderLayer(nn.Module):
    cfg: ModelConfig
    mode: str
    dtype: Any = jnp.bfloat16
    layer_idx: int = 0
    tp: int = 1
    tp_axis: Any = None
    fused: bool = False
    sp: bool = False
    cp: int = 1
    cp_axis: Any = None
    int4_group: int = 128
    int4_storage: str = "packed"
    fp8_group: int = 0
    # LoRA adapters (nn/lora.py): rank 0 = off; targets = projection names
    # that carry an adapter (fused layers use their fused names).
    lora_rank: int = 0
    lora_alpha: float = 16.0
    lora_targets: tuple = ("q_proj", "k_proj", "v_proj", "o_proj")
    lora_stack: int = 0  # multi-LoRA: stacked adapter count (0 = single)
    collective: bool = False

    @nn.compact
    def __call__(self, x, positions, cache, advance=None, adapter_ids=None,
                 tree_mask=None):
        from .. import ops

        # Fused norm+quant producers (ops/fused_quant.py): the norm emits
        # (int8, scale) directly for the dynamic projections — one HBM pass
        # instead of three. SP quantizes at the gather instead; MoE routes
        # per-token and keeps the bf16 normed activation.
        fq = (
            self.mode == "dynamic"
            and not self.sp
            and self.cfg.norm_type == "rmsnorm"
            and not self.cfg.parallel_block
            and ops.resolve_fused_quant()
        )

        def norm(name, quant_out):
            return make_norm(self.cfg, self.dtype, name, quant_out=quant_out)

        def deq(preq):
            xq, sx = preq
            return (xq.astype(jnp.float32) * sx[..., None]).astype(self.dtype)

        if self.cfg.parallel_block:
            # GPT-NeoX/Pythia parallel residual: attention and MLP both read
            # norms of the SAME layer input; one residual add. (NeoX
            # use_parallel_residual=True; HF GPTNeoXLayer.forward.)
            assert not (self.cfg.is_mla or self.cfg.layer_is_moe(self.layer_idx)), (
                "parallel_block: MLA/MoE unsupported"
            )
            a_in = norm("input_layernorm", False)(x)
            m_in = (
                a_in  # Falcon-7B: one norm feeds both sublayers
                if self.cfg.parallel_block_single_norm
                else norm("post_attention_layernorm", False)(x)
            )
            h_attn, new_cache = Attention(
                self.cfg, self.mode, self.dtype, self.layer_idx, self.tp,
                self.tp_axis, self.fused,
                self.sp, self.cp, self.cp_axis, self.int4_group,
                int4_storage=self.int4_storage, fp8_group=self.fp8_group,
                lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
                lora_targets=self.lora_targets, lora_stack=self.lora_stack,
                collective=self.collective, name="self_attn",
            )(a_in, positions, cache, advance, preq=None,
              adapter_ids=adapter_ids, tree_mask=tree_mask)
            h_mlp = MLP(
                self.cfg, self.mode, self.dtype, self.tp, self.tp_axis,
                self.fused, self.sp, self.int4_group,
                int4_storage=self.int4_storage, fp8_group=self.fp8_group,
                lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
                lora_targets=self.lora_targets, lora_stack=self.lora_stack,
                collective=self.collective, name="mlp",
            )(m_in, preq=None, adapter_ids=adapter_ids)
            return x + h_attn + h_mlp, new_cache

        sandwich = self.cfg.sandwich_norms
        post = self.cfg.post_norm
        if post:
            # OLMo-2: no input norm — attention reads the raw residual
            # stream; post_attention_layernorm applies to its OUTPUT below.
            attn_preq = None
            attn_in = x
        elif fq and not sandwich:
            attn_preq = norm("input_layernorm", True)(x)
            attn_in = deq(attn_preq)  # stub; DCE'd (projections use the preq)
        else:
            attn_preq = None
            attn_in = norm("input_layernorm", False)(x)
        if self.cfg.is_mla:
            # DeepSeek-V2/V3 multi-head latent attention (models/mla.py).
            from .mla import MLAAttention

            assert not (self.sp or self.fused or self.cp > 1), (
                "MLA: sp/fused/cp unsupported"
            )
            h, new_cache = MLAAttention(
                self.cfg, self.mode, self.dtype, self.layer_idx, self.tp,
                self.tp_axis, self.int4_group,
                int4_storage=self.int4_storage, fp8_group=self.fp8_group,
                collective=self.collective, name="self_attn",
            )(attn_in, positions, cache, advance, preq=attn_preq,
              tree_mask=tree_mask)
        else:
            h, new_cache = Attention(
                self.cfg, self.mode, self.dtype, self.layer_idx, self.tp,
                self.tp_axis, self.fused,
                self.sp, self.cp, self.cp_axis, self.int4_group,
                int4_storage=self.int4_storage, fp8_group=self.fp8_group,
                lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
                lora_targets=self.lora_targets, lora_stack=self.lora_stack,
                collective=self.collective, name="self_attn"
            )(attn_in, positions, cache, advance, preq=attn_preq,
              adapter_ids=adapter_ids, tree_mask=tree_mask)
        if sandwich or post:
            # Gemma-2 sandwich / OLMo-2 post-norm: normalize the attention
            # OUTPUT before the residual add.
            h = norm("post_attention_layernorm", False)(h)
        x = x + h
        if post:
            mlp_preq = None
            normed = x  # OLMo-2: the MLP reads the raw residual stream too
        elif sandwich:
            mlp_preq = None
            normed = norm("pre_feedforward_layernorm", False)(x)
        elif fq and not self.cfg.is_moe:
            mlp_preq = norm("post_attention_layernorm", True)(x)
            normed = deq(mlp_preq)
        else:
            mlp_preq = None
            normed = norm("post_attention_layernorm", False)(x)
        if self.cfg.layer_is_moe(self.layer_idx):
            # Mixtral-family sparse MLP. Under a mesh, the experts shard over
            # the same axis TP uses (EP replaces MLP tensor parallelism; the
            # psum traffic shape is identical). SP/fused don't apply.
            from .moe import MoEMLP

            assert not (self.sp or self.fused), "MoE: sp/fused unsupported"
            h = MoEMLP(
                self.cfg, self.mode, self.dtype, ep=self.tp,
                ep_axis=self.tp_axis, int4_group=self.int4_group,
                name="block_sparse_moe",
            )(normed)
        else:
            h = MLP(
                self.cfg, self.mode, self.dtype, self.tp, self.tp_axis,
                self.fused, self.sp, self.int4_group,
                int4_storage=self.int4_storage, fp8_group=self.fp8_group,
                lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
                lora_targets=self.lora_targets, lora_stack=self.lora_stack,
                collective=self.collective, name="mlp",
            )(normed, preq=mlp_preq, adapter_ids=adapter_ids)
        if sandwich or post:
            h = norm("post_feedforward_layernorm", False)(h)
        return x + h, new_cache


class LlamaModel(nn.Module):
    """Decoder-only LM. Call modes:

    * scoring/prefill without cache: ``model.apply(p, tokens)`` -> logits
    * incremental: ``model.apply(p, tokens, positions, caches)`` ->
      (logits, new_caches)
    """

    cfg: ModelConfig
    mode: str = "dynamic"
    dtype: Any = jnp.bfloat16
    # Tensor parallelism (used when the model runs inside shard_map over a
    # mesh axis named ``tp_axis``; every Linear weight is a local shard).
    tp: int = 1
    tp_axis: Any = None
    # Fused QKV / gate-up projections (single-chip decode optimization;
    # params pre-fused via nn.fuse_projections). Mutually exclusive with tp>1.
    fused: bool = False
    # Sequence parallelism for the norm/elementwise regions between TP blocks
    # (prefill/scoring; requires tp_axis and T divisible by tp).
    sp: bool = False
    # Context parallelism: ring attention over a sequence-sharded mesh axis
    # (cache-free scoring/prefill path; tokens arrive seq-sharded).
    cp: int = 1
    cp_axis: Any = None
    # int4 quantization-group size (match QuantConfig.int4_group at convert).
    int4_group: int = 128
    # int4 payload layout (match QuantConfig.int4_storage at convert).
    int4_storage: str = "packed"
    fp8_group: int = 0
    # LoRA adapters on the quantized base (nn/lora.py): 0 = off.
    lora_rank: int = 0
    lora_alpha: float = 16.0
    lora_targets: tuple = ("q_proj", "k_proj", "v_proj", "o_proj")
    lora_stack: int = 0  # multi-LoRA: stacked adapter count (0 = single)
    # Overlapped ring collective matmuls for the row-parallel projections
    # (o_proj/down_proj) instead of bare psum (SURVEY.md §5.8 mechanism 2).
    collective: bool = False

    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,  # [B, T] int32
        positions: Optional[jnp.ndarray] = None,  # [B, T]
        caches: Optional[list] = None,
        advance: Optional[jnp.ndarray] = None,  # [B] engine override
        adapter_ids: Optional[jnp.ndarray] = None,  # [B] multi-LoRA ids
        tree_mask: Optional[jnp.ndarray] = None,  # [T, T] spec-tree mask
        return_hidden: bool = False,  # also return the final-norm hidden
        #   state [B, T, hidden] (drafting heads — models/medusa.py)
    ):
        cfg = self.cfg
        B, T = tokens.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))

        x = nn.Embed(
            cfg.vocab_size,
            cfg.hidden_size,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="embed_tokens",
        )(tokens)
        if cfg.scale_embeddings:
            # Gemma normalizer, applied in the activation dtype like HF does.
            x = x * jnp.asarray(cfg.hidden_size**0.5, self.dtype)
        if cfg.embedding_layernorm:
            # BLOOM: LayerNorm directly on the embedding output
            # (word_embeddings_layernorm in the HF checkpoint).
            x = make_norm(cfg, self.dtype, "embed_norm")(x)
        if cfg.position_embedding == "learned":
            # GPT-2-class absolute positions: one learned table added to the
            # token embedding; attention layers are rope-free.
            x = x + nn.Embed(
                cfg.max_position_embeddings,
                cfg.hidden_size,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="embed_positions",
            )(jnp.minimum(positions, cfg.max_position_embeddings - 1))

        if self.sp:
            # Enter the token-sharded region: each shard keeps its T/tp slice.
            r = jax.lax.axis_index(self.tp_axis)
            t_local = T // self.tp
            x = jax.lax.dynamic_slice_in_dim(x, r * t_local, t_local, axis=1)

        new_caches = []
        for i in range(cfg.num_hidden_layers):
            cache_i = caches[i] if caches is not None else None
            x, nc = DecoderLayer(
                cfg, self.mode, self.dtype, i, self.tp, self.tp_axis,
                self.fused, self.sp, self.cp, self.cp_axis, self.int4_group,
                int4_storage=self.int4_storage, fp8_group=self.fp8_group,
                lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
                lora_targets=self.lora_targets, lora_stack=self.lora_stack,
                collective=self.collective,
                name=f"layers_{i}",
            )(x, positions, cache_i, advance, adapter_ids=adapter_ids,
              tree_mask=tree_mask)
            new_caches.append(nc)

        x = make_norm(cfg, self.dtype, "norm")(x)
        if self.sp:
            # The SP region ends here: the column-parallel lm_head needs the
            # full sequence on every shard (it is vocab-sharded over the same
            # axis the tokens were sharded over).
            x = jax.lax.all_gather(x, self.tp_axis, axis=1, tiled=True)
        hidden = x if return_hidden else None
        # Vocab-column-parallel LM head; logits all-gathered so sampling sees
        # the full vocabulary on every shard.
        logits = QLinear(
            cfg.vocab_size // self.tp,
            mode=self.mode,
            use_bias=False,
            dtype=self.dtype,
            int4_group=self.int4_group,
            int4_storage=self.int4_storage, fp8_group=self.fp8_group,
            lora_rank=(self.lora_rank if "lm_head" in self.lora_targets else 0),
            lora_alpha=self.lora_alpha,
            lora_stack=self.lora_stack,
            name="lm_head",
        )(x, None, adapter_ids)
        if self.tp_axis is not None:
            logits = jax.lax.all_gather(
                logits, self.tp_axis, axis=logits.ndim - 1, tiled=True
            )
        logits = logits.astype(jnp.float32)
        if cfg.logit_scale:
            # Cohere Command-R: constant logit multiplier.
            logits = logits * cfg.logit_scale
        if cfg.final_logit_softcap:
            cap = cfg.final_logit_softcap
            logits = cap * jnp.tanh(logits / cap)
        if caches is None:
            return (logits, hidden) if return_hidden else logits
        if return_hidden:
            return logits, new_caches, hidden
        return logits, new_caches
