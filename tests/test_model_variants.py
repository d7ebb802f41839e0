"""Qwen2/Gemma architecture variants through the quantized stack.

HF-semantics parity lives in test_hf_parity.py; here the variants run the
same ladder the Llama family does: int8-dynamic logit agreement vs fp,
bias-preserving projection fusion, and end-to-end Engine decode.
"""

import numpy as np

import jax
import jax.numpy as jnp

from protoquant_tpu.engine import Engine, EngineConfig
from protoquant_tpu.models import LlamaModel
from protoquant_tpu.nn import fuse_projections, quantize_params
from protoquant_tpu.utils.config import ModelConfig, QuantConfig

import pytest

# Subsystem matrix: full-coverage tier (fast tier: -m 'not slow').
pytestmark = pytest.mark.slow

QWEN2_TINY = ModelConfig(
    vocab_size=64, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=64, rope_theta=1e6, attention_bias=True,
)
GEMMA_TINY = ModelConfig(
    vocab_size=64, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=64, tie_word_embeddings=True,
    hidden_act="gelu_tanh", rmsnorm_unit_offset=True, scale_embeddings=True,
    head_dim_override=32,
)


def _init_fp(cfg, seed=0):
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    tokens = jnp.ones((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(seed), tokens)
    # Flax bias init is zeros; randomize so the bias path is load-bearing.
    if cfg.attention_bias:
        rng = np.random.default_rng(3)
        params = jax.tree_util.tree_map_with_path(
            lambda path, a: jnp.asarray(
                rng.normal(0, 0.05, a.shape).astype(np.float32)
            )
            if any(getattr(p, "key", None) == "bias" for p in path)
            else a,
            params,
        )
    return model, params


def _check_dynamic_close(cfg, seed):
    fp_model, fp_params = _init_fp(cfg, seed)
    toks = jnp.asarray(
        np.random.default_rng(seed).integers(0, cfg.vocab_size, (2, 10)), jnp.int32
    )
    lfp = np.asarray(fp_model.apply(fp_params, toks))
    q_model = LlamaModel(cfg, mode="dynamic", dtype=jnp.float32)
    qparams = quantize_params(fp_params, QuantConfig(mode="dynamic"))
    lq = np.asarray(q_model.apply(qparams, toks))
    assert np.isfinite(lq).all()
    # int8-dynamic logits track fp within quantization noise.
    err = np.abs(lq - lfp).max() / (np.abs(lfp).max() + 1e-9)
    assert err < 0.12, err
    agree = np.mean(np.argmax(lq, -1) == np.argmax(lfp, -1))
    assert agree > 0.8, agree


def test_qwen2_dynamic_quantization():
    _check_dynamic_close(QWEN2_TINY, seed=0)


def test_gemma_dynamic_quantization():
    _check_dynamic_close(GEMMA_TINY, seed=1)


def test_fused_qkv_with_bias_exact():
    """Qwen2-style fused QKV: concatenated kernels AND biases — fp forward
    must be exact vs the unfused module."""
    cfg = QWEN2_TINY
    fp_model, fp_params = _init_fp(cfg, seed=2)
    toks = jnp.asarray(
        np.random.default_rng(5).integers(0, cfg.vocab_size, (1, 9)), jnp.int32
    )
    base = np.asarray(fp_model.apply(fp_params, toks))
    fused_params = fuse_projections(fp_params)
    fused_model = LlamaModel(cfg, mode="fp", dtype=jnp.float32, fused=True)
    fused = np.asarray(fused_model.apply(fused_params, toks))
    np.testing.assert_allclose(fused, base, rtol=1e-6, atol=1e-6)


def test_gemma_engine_decode():
    """Gemma-shaped model end-to-end through the continuous-batching engine
    (int8 KV): head_dim override must thread through cache layouts."""
    cfg = GEMMA_TINY
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(4), jnp.ones((1, 4), jnp.int32))
    eng = Engine(
        model, params,
        EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=16,
                     max_new_tokens=6),
        kv_dtype=jnp.int8,
    )
    rid = eng.add_request([1, 2, 3], 6)
    out = eng.run()[rid]
    assert len(out) == 6 and all(0 <= t < cfg.vocab_size for t in out)


MISTRAL_TINY = ModelConfig(
    vocab_size=64, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=64, sliding_window=5,
)


def test_sliding_window_cache_consistency():
    """Sliding-window attention must agree across every cache path: the
    cache-free scoring logits and the per-token cached decode logits (dense
    fp32 / dense int8 / paged int8 via the engine extend) line up."""
    model = LlamaModel(MISTRAL_TINY, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    rng = np.random.default_rng(9)
    toks = jnp.asarray(rng.integers(1, 64, (1, 12)), jnp.int32)

    ref = np.asarray(model.apply(params, toks))  # cache-free scoring

    from protoquant_tpu.models import init_cache

    for kv_dtype in (jnp.float32, jnp.int8):
        caches = init_cache(MISTRAL_TINY, 1, 32, kv_dtype=kv_dtype)
        outs = []
        for t in range(toks.shape[1]):
            logits, caches = model.apply(
                params, toks[:, t : t + 1],
                jnp.asarray([[t]], jnp.int32), caches,
            )
            outs.append(np.asarray(logits)[:, 0])
        got = np.stack(outs, axis=1)
        tol = 1e-4 if kv_dtype == jnp.float32 else 0.15
        np.testing.assert_allclose(got, ref, rtol=tol, atol=tol)
        # Greedy choices must agree exactly for the int8 cache too.
        if kv_dtype == jnp.int8:
            agree = np.mean(np.argmax(got, -1) == np.argmax(ref, -1))
            assert agree >= 0.9, agree


def test_sliding_window_engine_paged():
    """Mistral-style model end-to-end through the paged engine: the window
    forces the gather+XLA attend path; greedy output must equal the dense
    int8 engine's."""
    model = LlamaModel(MISTRAL_TINY, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 4), jnp.int32))
    prompt = list(range(1, 14))  # longer than the 5-token window

    dense = Engine(
        model, params,
        EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=16,
                     max_new_tokens=8),
        kv_dtype=jnp.int8,
    )
    r = dense.add_request(prompt, 8)
    ref = dense.run()[r]

    paged = Engine(
        model, params,
        EngineConfig(max_batch_size=2, max_seq_len=64, page_size=8,
                     prefill_chunk=16, max_new_tokens=8),
        kv_dtype=jnp.int8, kv_layout="paged",
    )
    r2 = paged.add_request(prompt, 8)
    assert paged.run()[r2] == ref


def test_ring_kv_cache_exact_vs_dense():
    """RingInt8KVCache (O(window) memory) reproduces the dense windowed
    int8 cache exactly across chunked prefill + decode, including after the
    ring wraps (total length > capacity)."""
    from protoquant_tpu.models.kv_cache import Int8KVCache, RingInt8KVCache

    rng = np.random.default_rng(3)
    B, KV, Dh, W = 2, 2, 16, 5
    ring = RingInt8KVCache.init(B, W, max_chunk=7, kv_heads=KV, head_dim=Dh)
    dense = Int8KVCache.init(B, 64, KV, Dh)
    assert ring.capacity == 32  # window+chunk rounded to 32 -> wraps below

    H = 4
    total = 0
    for step, t in enumerate([7, 7, 1, 1, 7, 7, 7, 1, 1, 1]):  # 40 > capacity
        q = jnp.asarray(rng.normal(size=(B, t, H, Dh)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, t, KV, Dh)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, t, KV, Dh)), jnp.float32)
        out_r, ring = ring.update_and_attend(q, k, v, window=W)
        out_d, dense = dense.update_and_attend(q, k, v, window=W)
        np.testing.assert_allclose(
            np.asarray(out_r), np.asarray(out_d), rtol=2e-5, atol=2e-5,
            err_msg=f"step {step} (len {total})",
        )
        total += t
    assert total > ring.capacity  # the ring actually wrapped
    # Memory: the ring holds 32 slots vs the dense cache's 64.
    assert ring.kq.shape[2] < dense.kq.shape[2]


def test_ring_engine_matches_dense_engine():
    """kv_layout='ring' serves a sliding-window model with O(window) KV
    memory and emits exactly the dense engine's greedy stream, including
    past the wrap point."""
    model = LlamaModel(MISTRAL_TINY, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 4), jnp.int32))
    prompt = list(np.random.default_rng(5).integers(1, 64, 20))
    prompt = [int(t) for t in prompt]

    cfg = EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=7,
                       max_new_tokens=20, temperature=0.0)
    dense = Engine(model, params, cfg, kv_dtype=jnp.int8)
    rd = dense.add_request(prompt, 20)
    ref = dense.run()[rd]

    ring = Engine(model, params, cfg, kv_dtype=jnp.int8, kv_layout="ring")
    rr = ring.add_request(prompt, 20)
    out = ring.run()[rr]
    assert out == ref, (out, ref)
    assert ring.caches[0].capacity == 32  # 40 total tokens wrapped it
    assert ring.caches[0].kq.shape[2] < dense.caches[0].kq.shape[2]


def test_ring_engine_guards():
    model = LlamaModel(QWEN2_TINY, mode="fp", dtype=jnp.float32)  # no window
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    import pytest

    with pytest.raises(ValueError, match="sliding_window"):
        Engine(
            model, params,
            EngineConfig(max_batch_size=2, max_seq_len=64),
            kv_dtype=jnp.int8, kv_layout="ring",
        )


def test_ring_attention_sinks_exact():
    """Ring cache with StreamingLLM sinks == dense cache + explicit
    sink|window masking, through the wrap point."""
    from protoquant_tpu.models.kv_cache import Int8KVCache, RingInt8KVCache
    from protoquant_tpu.ops.attention import int8_kv_attention_xla

    rng = np.random.default_rng(7)
    B, KV, Dh, W, S = 1, 2, 16, 6, 3
    ring = RingInt8KVCache.init(B, W, max_chunk=7, kv_heads=KV, head_dim=Dh,
                                sinks=S)
    dense = Int8KVCache.init(B, 64, KV, Dh)
    H = 4
    total = 0
    saw_sink_effect = False
    for t in [7, 7, 1, 1, 7, 1, 1, 7, 1]:  # 33 tokens, wraps the ring
        q = jnp.asarray(rng.normal(size=(B, t, H, Dh)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, t, KV, Dh)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, t, KV, Dh)), jnp.float32)
        out_r, ring = ring.update_and_attend(q, k, v)
        lengths_before = dense.lengths
        dense = dense.update(k, v)
        ref = int8_kv_attention_xla(
            q, dense.kq, dense.ks, dense.vq, dense.vs, lengths_before,
            window=W, sinks=S,
        )
        np.testing.assert_allclose(
            np.asarray(out_r), np.asarray(ref), rtol=2e-5, atol=2e-5,
            err_msg=f"len {total}",
        )
        # Control: once past window+sinks, the no-sink result must differ.
        if total + t > W + S:
            no_sink = int8_kv_attention_xla(
                q, dense.kq, dense.ks, dense.vq, dense.vs, lengths_before,
                window=W, sinks=0,
            )
            if np.abs(np.asarray(ref) - np.asarray(no_sink)).max() > 1e-4:
                saw_sink_effect = True
        total += t
    assert total > ring.capacity  # wrapped
    assert saw_sink_effect  # sinks actually changed the attention


def test_streaming_engine_window_free_model():
    """StreamingLLM serving: a FULL-attention model (no trained window)
    decodes an unbounded-ish stream through the ring layout with serving
    window + attention sinks — O(window) memory, valid outputs far past
    the window."""
    model = LlamaModel(QWEN2_TINY, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 4), jnp.int32))
    cfg = EngineConfig(max_batch_size=1, max_seq_len=128, prefill_chunk=7,
                       max_new_tokens=60, temperature=0.0,
                       stream_window=12, attention_sinks=4)
    eng = Engine(model, params, cfg, kv_dtype=jnp.int8, kv_layout="ring")
    rid = eng.add_request(list(range(1, 15)), 60)
    out = eng.run()[rid]
    assert len(out) == 60
    assert all(0 <= t < QWEN2_TINY.vocab_size for t in out)
    assert eng.caches[0].capacity < 64  # far below the 74-token stream
    assert eng.caches[0].sinks == 4


def test_streaming_engine_small_window_bucket_slack():
    """Regression: prefill pieces pad to 16-token buckets, so the ring must
    size its slack for the PADDED chunk even when prefill_chunk and the
    window are small (used to raise 'chunk 16 exceeds ring slack 12')."""
    model = LlamaModel(QWEN2_TINY, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 4), jnp.int32))
    cfg = EngineConfig(max_batch_size=1, max_seq_len=64, prefill_chunk=8,
                       max_new_tokens=30, temperature=0.0,
                       stream_window=16, attention_sinks=4)
    eng = Engine(model, params, cfg, kv_dtype=jnp.int8, kv_layout="ring")
    rid = eng.add_request(list(range(1, 20)), 30)
    out = eng.run()[rid]
    assert len(out) == 30


PHI3_TINY = ModelConfig(
    vocab_size=64, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
    max_position_embeddings=64, sliding_window=5, partial_rotary_factor=0.5,
    rope_scaling_type="longrope",
    # original_max >= max_seq here so the whole test runs on the SHORT
    # branch: the short/long runtime switch (pinned vs transformers in
    # test_hf_parity.py) intentionally re-ropes only NEW tokens, so scoring
    # and incremental decode agree only within a single branch.
    rope_scaling_original_max_position_embeddings=64,
    rope_scaling_short_factor=(1.0, 1.1, 1.3, 1.6),
    rope_scaling_long_factor=(2.0, 2.5, 3.0, 4.0),
)
OLMO2_TINY = ModelConfig(
    vocab_size=64, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=64, rope_theta=500000.0,
    post_norm=True, qk_norm=True, qk_norm_full=True,
)


def test_phi3_dynamic_quantization():
    _check_dynamic_close(PHI3_TINY, seed=5)


def test_olmo2_dynamic_quantization():
    _check_dynamic_close(OLMO2_TINY, seed=6)


def _check_cache_consistency(cfg, fused=False, seed=0):
    """Cache-free scoring vs per-token cached decode (dense fp32 + int8)."""
    from protoquant_tpu.models import init_cache

    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32, fused=fused)
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 4), jnp.int32))
    rng = np.random.default_rng(seed)
    toks = jnp.asarray(rng.integers(1, cfg.vocab_size, (1, 12)), jnp.int32)
    ref = np.asarray(model.apply(params, toks))
    for kv_dtype in (jnp.float32, jnp.int8):
        caches = init_cache(cfg, 1, 32, kv_dtype=kv_dtype)
        outs = []
        for t in range(toks.shape[1]):
            logits, caches = model.apply(
                params, toks[:, t : t + 1], jnp.asarray([[t]], jnp.int32),
                caches,
            )
            outs.append(np.asarray(logits)[:, 0])
        got = np.stack(outs, axis=1)
        tol = 1e-4 if kv_dtype == jnp.float32 else 0.15
        np.testing.assert_allclose(got, ref, rtol=tol, atol=tol)
        if kv_dtype == jnp.int8:
            agree = np.mean(np.argmax(got, -1) == np.argmax(ref, -1))
            assert agree >= 0.9, agree


def test_phi3_cache_consistency():
    """Phi-3 shape (fused qkv/gate_up + longrope + partial rotary + sliding
    window) through every cache path."""
    _check_cache_consistency(PHI3_TINY, fused=True, seed=7)


def test_olmo2_cache_consistency():
    """OLMo-2 shape (post-norm + full-width qk-norm) through every cache
    path."""
    _check_cache_consistency(OLMO2_TINY, seed=8)


def test_olmo2_engine_decode():
    """OLMo-2 shape end-to-end through the continuous-batching engine."""
    model = LlamaModel(OLMO2_TINY, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(9), jnp.ones((1, 4), jnp.int32))
    eng = Engine(
        model, params,
        EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=16,
                     max_new_tokens=6),
        kv_dtype=jnp.int8,
    )
    rid = eng.add_request([1, 2, 3], 6)
    out = eng.run()[rid]
    assert len(out) == 6 and all(0 <= t < OLMO2_TINY.vocab_size for t in out)


BLOOM_TINY = ModelConfig(
    vocab_size=64, hidden_size=64, intermediate_size=256,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
    max_position_embeddings=64, norm_type="layernorm", mlp_gated=False,
    mlp_bias=True, attention_bias=True, attention_out_bias=True,
    hidden_act="gelu", position_embedding="alibi", embedding_layernorm=True,
    tie_word_embeddings=True,
)


def test_bloom_alibi_cache_consistency():
    """ALiBi attention (BLOOM shape: rope-free distance biases + embedding
    LayerNorm) through the bf16 AND int8 cache paths — the int8 path runs
    the flash kernel's in-kernel slope rows (round 4); per-token decode
    must reproduce cache-free scoring."""
    _check_cache_consistency(BLOOM_TINY, seed=13)


def test_bloom_alibi_engine_matches_plain_greedy():
    """ALiBi models serve through the continuous-batching engine: batched
    == sequential, and linear speculation stays exact (the scoring
    formulation carries the alibi bias)."""
    from protoquant_tpu.engine import Engine, EngineConfig

    model = LlamaModel(BLOOM_TINY, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 4), jnp.int32))
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=16,
                        max_new_tokens=10, temperature=0.0)
    prompts = [[5, 9, 2, 7], [1, 2, 3]]

    seq = []
    for p in prompts:
        e = Engine(model, params, ecfg, kv_dtype=jnp.int8)
        rid = e.add_request(p, 10)
        seq.append(e.run()[rid])

    eng = Engine(model, params, ecfg, kv_dtype=jnp.int8)
    rids = [eng.add_request(p, 10) for p in prompts]
    outs = eng.run()
    for ref, rid in zip(seq, rids):
        assert outs[rid] == ref

    spec = Engine(model, params, ecfg, kv_dtype=jnp.int8,
                  draft_model=model, draft_params=params, gamma=3)
    srids = [spec.add_request(p, 10) for p in prompts]
    souts = spec.run()
    for ref, rid in zip(seq, srids):
        assert souts[rid] == ref

    # Round 5 (VERDICT r4 item 4): the capacity tiers serve ALiBi models
    # now — the int4/k4v8 kernels carry in-kernel slope rows.
    for kvd in (jnp.int4, "k4v8"):
        e4 = Engine(model, params, ecfg, kv_dtype=kvd)
        r4 = e4.add_request([1, 2, 3], 6)
        out4 = e4.run()[r4]
        assert len(out4) == 6
        assert all(0 <= t < BLOOM_TINY.vocab_size for t in out4)


def test_bloom_alibi_capacity_caches_consistency():
    """ALiBi per-token decode on the int4-KIVI and K4V8 caches tracks
    cache-free scoring (the guards lifted in round 5)."""
    from protoquant_tpu.models import init_cache

    model = LlamaModel(BLOOM_TINY, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(13), jnp.zeros((1, 4), jnp.int32))
    rng = np.random.default_rng(13)
    toks = jnp.asarray(
        rng.integers(1, BLOOM_TINY.vocab_size, (1, 12)), jnp.int32)
    ref = np.asarray(model.apply(params, toks))
    for kvd in (jnp.int4, "k4v8"):
        caches = init_cache(BLOOM_TINY, 1, 32, kv_dtype=kvd)
        outs = []
        for t in range(toks.shape[1]):
            logits, caches = model.apply(
                params, toks[:, t: t + 1], jnp.asarray([[t]], jnp.int32),
                caches)
            outs.append(np.asarray(logits)[:, 0])
        got = np.stack(outs, axis=1)
        agree = np.mean(np.argmax(got, -1) == np.argmax(ref, -1))
        assert agree >= 0.9, (kvd, agree)


def test_bloom_alibi_streaming_ring_engine():
    """StreamingLLM serving for an ALiBi model (the natural home: length
    extrapolation is ALiBi's selling point): ring layout + serving window
    + attention sinks, valid outputs far past the window — the guard
    lifted in round 5."""
    model = LlamaModel(BLOOM_TINY, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(13), jnp.zeros((1, 4), jnp.int32))
    cfg = EngineConfig(max_batch_size=1, max_seq_len=128, prefill_chunk=7,
                       max_new_tokens=60, temperature=0.0,
                       stream_window=12, attention_sinks=4)
    eng = Engine(model, params, cfg, kv_dtype=jnp.int8, kv_layout="ring")
    rid = eng.add_request(list(range(1, 15)), 60)
    out = eng.run()[rid]
    assert len(out) == 60
    assert all(0 <= t < BLOOM_TINY.vocab_size for t in out)
    assert eng.caches[0].capacity < 64  # far below the 74-token stream


def test_bloom_alibi_ring_matches_dense_windowed():
    """Cache-level exactness: the ring cache's ALiBi attention equals a
    dense int8 cache under the same window+sinks at every step (per-column
    absolute positions drive both the mask AND the bias)."""
    from protoquant_tpu.models.kv_cache import (
        Int8KVCache,
        RingInt8KVCache,
    )
    from protoquant_tpu.models.llama import alibi_slopes
    from protoquant_tpu.ops.attention import int8_kv_attention_xla

    rng = np.random.default_rng(14)
    B, KV, Dh, H, W, SINKS = 1, 2, 16, 4, 8, 2
    slopes = jnp.asarray(alibi_slopes(H))
    ring = RingInt8KVCache.init(B, W, 4, KV, Dh, sinks=SINKS)
    dense = Int8KVCache.init(B, 64, KV, Dh)
    for t in range(30):
        kv = jnp.asarray(rng.standard_normal((B, 1, KV, Dh)), jnp.float32)
        q = jnp.asarray(rng.standard_normal((B, 1, H, Dh)), jnp.float32)
        lengths = dense.lengths
        out_r, ring = ring.update_and_attend(
            q, kv, kv, alibi_slopes=slopes)
        dense = dense.update(kv, kv)
        out_d = int8_kv_attention_xla(
            q, dense.kq, dense.ks, dense.vq, dense.vs, lengths,
            window=W, sinks=SINKS, alibi_slopes=slopes)
        np.testing.assert_allclose(
            np.asarray(out_r), np.asarray(out_d), rtol=2e-4, atol=2e-4,
            err_msg=f"step {t}")


def test_bloom_alibi_paged_engine_matches_dense():
    """ALiBi models serve on the PAGED layout (round 4: in-kernel slope
    rows in the page-walk kernel; the gather/prefill path carries the bias
    through the XLA formulation). Paged == dense, batched."""
    from protoquant_tpu.engine import Engine, EngineConfig

    model = LlamaModel(BLOOM_TINY, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 4), jnp.int32))
    prompts = [[5, 9, 2, 7], [1, 2, 3]]

    ecfg = EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=16,
                        max_new_tokens=10, temperature=0.0)
    dense = Engine(model, params, ecfg, kv_dtype=jnp.int8)
    drids = [dense.add_request(p, 10) for p in prompts]
    douts = dense.run()

    pcfg = EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=16,
                        max_new_tokens=10, temperature=0.0, page_size=16)
    paged = Engine(model, params, pcfg, kv_dtype=jnp.int8,
                   kv_layout="paged")
    prids = [paged.add_request(p, 10) for p in prompts]
    pouts = paged.run()
    for drid, prid in zip(drids, prids):
        assert pouts[prid] == douts[drid]


GEMMA2_TINY = ModelConfig(
    vocab_size=64, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=64, rms_norm_eps=1e-6,
    tie_word_embeddings=True, hidden_act="gelu_tanh",
    rmsnorm_unit_offset=True, scale_embeddings=True, head_dim_override=32,
    query_pre_attn_scalar=16.0, attn_logit_softcap=50.0,
    final_logit_softcap=30.0, sliding_window=4,
    alternating_sliding_window=True, sandwich_norms=True,
)


def test_gemma2_hybrid_ring_matches_dense():
    """Gemma-2 on the ring layout via PER-LAYER HYBRID caches (round 5,
    VERDICT r4 item 6): sliding layers get O(window) ring buffers, the
    full-attention layers keep dense caches — and the greedy stream
    exactly matches the all-dense engine (the ring's windowed attention is
    exact vs the dense windowed cache, layer for layer)."""
    from protoquant_tpu.models.kv_cache import Int8KVCache, RingInt8KVCache

    model = LlamaModel(GEMMA2_TINY, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(6), jnp.zeros((1, 4), jnp.int32))
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=16,
                        max_new_tokens=20, temperature=0.0)
    prompts = [[5, 9, 2, 7, 1, 3, 8, 8], [1, 2, 3]]

    dense = Engine(model, params, ecfg, kv_dtype=jnp.int8)
    drids = [dense.add_request(p, 20) for p in prompts]
    douts = dense.run()

    ring = Engine(model, params, ecfg, kv_dtype=jnp.int8, kv_layout="ring")
    # Layer 0 (sliding, (0+1) % 2 != 0) rides the ring; layer 1 (full
    # context) keeps a dense cache.
    assert isinstance(ring.caches[0], RingInt8KVCache)
    assert isinstance(ring.caches[1], Int8KVCache)
    assert ring.caches[0].capacity < ecfg.max_seq_len
    rrids = [ring.add_request(p, 20) for p in prompts]
    routs = ring.run()
    for rd, rr in zip(drids, rrids):
        assert douts[rd] == routs[rr], (douts[rd], routs[rr])


def test_gemma3_pattern_hybrid_ring_matches_dense():
    """Gemma-3 pattern (every Nth layer global): the hybrid ring builds
    ring buffers on sliding layers and dense caches on the global layers,
    exact vs the all-dense engine."""
    from protoquant_tpu.models.kv_cache import Int8KVCache, RingInt8KVCache

    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=True,
        hidden_act="gelu_tanh", rmsnorm_unit_offset=True,
        scale_embeddings=True, head_dim_override=32, sliding_window=4,
        sliding_window_pattern=3, sandwich_norms=True,
    )
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(7), jnp.zeros((1, 4), jnp.int32))
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=16,
                        max_new_tokens=16, temperature=0.0)
    prompts = [[5, 9, 2, 7, 1], [1, 2, 3]]

    dense = Engine(model, params, ecfg, kv_dtype=jnp.int8)
    drids = [dense.add_request(p, 16) for p in prompts]
    douts = dense.run()

    ring = Engine(model, params, ecfg, kv_dtype=jnp.int8, kv_layout="ring")
    # Pattern 3: layers 0, 1 sliding ((i+1) % 3 != 0), layer 2 global.
    assert isinstance(ring.caches[0], RingInt8KVCache)
    assert isinstance(ring.caches[1], RingInt8KVCache)
    assert isinstance(ring.caches[2], Int8KVCache)
    rrids = [ring.add_request(p, 16) for p in prompts]
    routs = ring.run()
    for rd, rr in zip(drids, rrids):
        assert douts[rd] == routs[rr], (douts[rd], routs[rr])
