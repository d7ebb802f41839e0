"""M2/M3: model tier — toy transformer logit match (acceptance config 2) and
Llama-architecture decode with KV cache (config 3 shape, local weights)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protoquant_tpu.models import (
    LlamaModel,
    greedy_generate,
    import_hf_llama,
    init_cache,
    perplexity,
)
from protoquant_tpu.nn import quantize_params
from protoquant_tpu.utils.config import ModelConfig

TINY = ModelConfig.tiny(vocab_size=128)


def _init_fp_params(cfg, seed=0):
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    tokens = jnp.zeros((1, 4), jnp.int32)
    return model, model.init(jax.random.PRNGKey(seed), tokens)


@pytest.fixture(scope="module")
def tiny_fp():
    return _init_fp_params(TINY)


def test_toy_logit_match_config2(tiny_fp):
    """Acceptance config 2 (BASELINE.json:8): 2-layer d=512 transformer, all
    projections int8-dynamic, logit match vs fp32."""
    fp_model, fp_params = tiny_fp
    tokens = jnp.asarray(
        np.random.default_rng(1).integers(0, TINY.vocab_size, (2, 16)), jnp.int32
    )
    logits_fp = np.asarray(fp_model.apply(fp_params, tokens))

    q_model = LlamaModel(TINY, mode="dynamic", dtype=jnp.float32)
    logits_q = np.asarray(q_model.apply(quantize_params(fp_params), tokens))

    assert logits_fp.shape == logits_q.shape == (2, 16, TINY.vocab_size)
    cos = np.sum(logits_fp * logits_q) / (
        np.linalg.norm(logits_fp) * np.linalg.norm(logits_q) + 1e-12
    )
    assert cos > 0.99, f"cosine {cos}"
    # Top-1 agreement on the vast majority of positions.
    agree = np.mean(
        np.argmax(logits_fp, axis=-1) == np.argmax(logits_q, axis=-1)
    )
    assert agree > 0.85, f"top-1 agreement {agree}"


@pytest.mark.slow
def test_kv_cache_decode_matches_full_forward(tiny_fp):
    """Incremental decode with cache == cache-free full forward (same params).
    This pins the cache/positions/masking logic."""
    fp_model, fp_params = tiny_fp
    rng = np.random.default_rng(2)
    tokens = jnp.asarray(rng.integers(0, TINY.vocab_size, (1, 12)), jnp.int32)

    logits_full = np.asarray(fp_model.apply(fp_params, tokens))

    caches = init_cache(TINY, 1, 32, jnp.float32)
    # Prefill first 8, then decode 4 one at a time.
    pos = jnp.arange(8)[None, :]
    lg, caches = fp_model.apply(fp_params, tokens[:, :8], pos, caches)
    step_logits = [np.asarray(lg)]
    for t in range(8, 12):
        pos = jnp.full((1, 1), t, jnp.int32)
        lg, caches = fp_model.apply(fp_params, tokens[:, t : t + 1], pos, caches)
        step_logits.append(np.asarray(lg))
    logits_inc = np.concatenate(step_logits, axis=1)
    np.testing.assert_allclose(logits_inc, logits_full, rtol=2e-4, atol=2e-4)


def test_greedy_generate_runs(tiny_fp):
    fp_model, fp_params = tiny_fp
    prompt = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    out = greedy_generate(fp_model, fp_params, prompt, max_new_tokens=8, max_seq=32)
    assert out.shape == (1, 8)
    assert np.all((np.asarray(out) >= 0) & (np.asarray(out) < TINY.vocab_size))


def test_config3_weight_only_greedy_match_and_ppl(tiny_fp):
    """Config 3 pattern (BASELINE.json:9) at toy scale: weight-only int8
    decode greedy-matches fp and stays within the perplexity budget."""
    fp_model, fp_params = tiny_fp
    prompt = jnp.asarray([[5, 9, 2, 7, 1, 3]], jnp.int32)
    out_fp = np.asarray(
        greedy_generate(fp_model, fp_params, prompt, max_new_tokens=8, max_seq=32)
    )

    wo_model = LlamaModel(TINY, mode="weight_only", dtype=jnp.float32)
    wo_params = quantize_params(fp_params)
    out_wo = np.asarray(
        greedy_generate(wo_model, wo_params, prompt, max_new_tokens=8, max_seq=32)
    )
    match = np.mean(out_fp == out_wo)
    assert match >= 0.75, f"greedy match {match}"

    eval_tokens = jnp.asarray(
        np.random.default_rng(3).integers(0, TINY.vocab_size, (2, 64)), jnp.int32
    )
    ppl_fp = perplexity(fp_model, fp_params, eval_tokens)
    ppl_wo = perplexity(wo_model, wo_params, eval_tokens)
    # <0.1 delta budget (BASELINE.json:5); random weights make ppl ~vocab, so
    # use relative delta at this scale.
    assert abs(ppl_wo - ppl_fp) / ppl_fp < 0.02, (ppl_fp, ppl_wo)


def test_hf_import_roundtrip():
    """Build an HF-style state dict, import it, and check the model runs and
    layer shapes line up."""
    cfg = ModelConfig(
        vocab_size=64,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
    )
    rng = np.random.default_rng(4)
    D, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    kv = cfg.num_key_value_heads * cfg.head_dim
    sd = {
        "model.embed_tokens.weight": rng.standard_normal((V, D)).astype(np.float32),
        "model.norm.weight": np.ones(D, np.float32),
        "lm_head.weight": rng.standard_normal((V, D)).astype(np.float32),
    }
    for i in range(2):
        pre = f"model.layers.{i}"
        sd[f"{pre}.input_layernorm.weight"] = np.ones(D, np.float32)
        sd[f"{pre}.post_attention_layernorm.weight"] = np.ones(D, np.float32)
        sd[f"{pre}.self_attn.q_proj.weight"] = 0.05 * rng.standard_normal((D, D)).astype(np.float32)
        sd[f"{pre}.self_attn.k_proj.weight"] = 0.05 * rng.standard_normal((kv, D)).astype(np.float32)
        sd[f"{pre}.self_attn.v_proj.weight"] = 0.05 * rng.standard_normal((kv, D)).astype(np.float32)
        sd[f"{pre}.self_attn.o_proj.weight"] = 0.05 * rng.standard_normal((D, D)).astype(np.float32)
        sd[f"{pre}.mlp.gate_proj.weight"] = 0.05 * rng.standard_normal((I, D)).astype(np.float32)
        sd[f"{pre}.mlp.up_proj.weight"] = 0.05 * rng.standard_normal((I, D)).astype(np.float32)
        sd[f"{pre}.mlp.down_proj.weight"] = 0.05 * rng.standard_normal((D, I)).astype(np.float32)

    params = import_hf_llama(sd, cfg)
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    tokens = jnp.asarray([[1, 2, 3]], jnp.int32)
    logits = model.apply(params, tokens)
    assert logits.shape == (1, 3, V)

    # And through quantization:
    qmodel = LlamaModel(cfg, mode="dynamic", dtype=jnp.float32)
    qlogits = qmodel.apply(quantize_params(params), tokens)
    a, b = np.asarray(logits), np.asarray(qlogits)
    cos = np.sum(a * b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.99


@pytest.mark.slow
def test_fused_projections_exact_match(tiny_fp):
    """Fused QKV / gate-up model == unfused model, bit-for-bit per mode
    (concat along N is exact for per-output-channel quantization)."""
    from protoquant_tpu.nn import fuse_projections, quantize_params

    fp_model, fp_params = tiny_fp
    tokens = jnp.asarray(
        np.random.default_rng(9).integers(0, TINY.vocab_size, (2, 10)), jnp.int32
    )
    fused_fp = fuse_projections(fp_params)

    for mode in ("fp", "dynamic", "weight_only"):
        base_model = LlamaModel(TINY, mode=mode, dtype=jnp.float32)
        fused_model = LlamaModel(TINY, mode=mode, dtype=jnp.float32, fused=True)
        if mode == "fp":
            pa, pb = fp_params, fused_fp
        else:
            pa, pb = quantize_params(fp_params), quantize_params(fused_fp)
        la = np.asarray(base_model.apply(pa, tokens))
        lb = np.asarray(fused_model.apply(pb, tokens))
        np.testing.assert_allclose(la, lb, rtol=1e-5, atol=1e-5), mode


@pytest.mark.slow
def test_fused_quant_model_matches_unfused():
    """FUSED_QUANT=on (fused norm->int8 and swiglu->int8 producers) matches
    the unfused dynamic model to quantization-noise tolerance."""
    import protoquant_tpu.ops as ops
    from protoquant_tpu.models import LlamaModel
    from protoquant_tpu.utils.config import ModelConfig

    cfg = ModelConfig(
        vocab_size=97, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64,
    )
    tokens = jnp.asarray(np.random.default_rng(5).integers(1, 97, (2, 9)), jnp.int32)
    model = LlamaModel(cfg, mode="dynamic", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), tokens)

    prev = ops.FUSED_QUANT
    try:
        ops.FUSED_QUANT = "off"
        ref = model.apply(params, tokens)
        ops.FUSED_QUANT = "on"
        got = model.apply(params, tokens)
    finally:
        ops.FUSED_QUANT = prev
    a, b = np.asarray(got, np.float32), np.asarray(ref, np.float32)
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.9999, cos
    np.testing.assert_allclose(a, b, rtol=0.05, atol=0.05)


NEOX_CFG_KW = dict(
    vocab_size=64, hidden_size=64, intermediate_size=256,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
    max_position_embeddings=128, norm_type="layernorm", parallel_block=True,
    mlp_gated=False, mlp_bias=True, attention_bias=True,
    attention_out_bias=True, hidden_act="gelu", partial_rotary_factor=0.25,
)


@pytest.mark.slow
def test_gpt_neox_cache_decode_matches_scoring():
    """The NeoX architecture axis (layernorm / parallel block / plain MLP /
    partial rotary) through the incremental cache path: prefill+decode
    logits equal cache-free scoring."""
    from protoquant_tpu.models import LlamaModel
    from protoquant_tpu.models.llama import init_cache
    from protoquant_tpu.utils.config import ModelConfig

    cfg = ModelConfig(**NEOX_CFG_KW)
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    toks = jnp.asarray(np.random.default_rng(3).integers(0, 64, (2, 10)),
                       jnp.int32)
    params = model.init(jax.random.PRNGKey(0), toks)
    ref = model.apply(params, toks)

    caches = init_cache(cfg, 2, 32, kv_dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(9)[None], (2, 9))
    lg_p, caches = model.apply(params, toks[:, :9], pos, caches)
    lg_d, caches = model.apply(
        params, toks[:, 9:], jnp.full((2, 1), 9, jnp.int32), caches
    )
    np.testing.assert_allclose(
        np.asarray(lg_p), np.asarray(ref[:, :9]), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(lg_d), np.asarray(ref[:, 9:]), rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow
def test_gpt_neox_quantized_engine_serves():
    """NeoX family end-to-end through quantize_params + the Engine (int8
    dynamic incl. the biased plain MLP), batched == sequential."""
    from protoquant_tpu.engine import Engine, EngineConfig
    from protoquant_tpu.models import LlamaModel
    from protoquant_tpu.nn import quantize_params
    from protoquant_tpu.utils.config import ModelConfig

    cfg = ModelConfig(**NEOX_CFG_KW)
    fp_model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    fp = fp_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    model = LlamaModel(cfg, mode="dynamic", dtype=jnp.float32)
    params = quantize_params(fp)

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
        assert outs[rid] == ref, (outs[rid], ref)


@pytest.mark.slow
def test_gpt2_style_cache_decode_and_engine():
    """Learned-position models through the incremental cache (decode
    positions come from cache lengths, indexing the learned table) and the
    quantized engine (batched == sequential)."""
    from protoquant_tpu.engine import Engine, EngineConfig
    from protoquant_tpu.models import LlamaModel
    from protoquant_tpu.models.llama import init_cache
    from protoquant_tpu.nn import quantize_params
    from protoquant_tpu.utils.config import ModelConfig

    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, norm_type="layernorm",
        position_embedding="learned", mlp_gated=False, mlp_bias=True,
        attention_bias=True, attention_out_bias=True, hidden_act="gelu",
    )
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    toks = jnp.asarray(np.random.default_rng(4).integers(0, 64, (2, 10)),
                       jnp.int32)
    params = model.init(jax.random.PRNGKey(0), toks)
    ref = model.apply(params, toks)
    caches = init_cache(cfg, 2, 32, kv_dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(9)[None], (2, 9))
    lg_p, caches = model.apply(params, toks[:, :9], pos, caches)
    lg_d, _ = model.apply(
        params, toks[:, 9:], jnp.full((2, 1), 9, jnp.int32), caches
    )
    np.testing.assert_allclose(np.asarray(lg_p), np.asarray(ref[:, :9]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(lg_d), np.asarray(ref[:, 9:]),
                               rtol=2e-4, atol=2e-4)

    qmodel = LlamaModel(cfg, mode="dynamic", dtype=jnp.float32)
    qparams = quantize_params(params)
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=16,
                        max_new_tokens=8, temperature=0.0)
    prompts = [[5, 9, 2, 7], [1, 2, 3]]
    seq = []
    for p in prompts:
        e = Engine(qmodel, qparams, ecfg, kv_dtype=jnp.int8)
        rid = e.add_request(p, 8)
        seq.append(e.run()[rid])
    eng = Engine(qmodel, qparams, ecfg, kv_dtype=jnp.int8)
    rids = [eng.add_request(p, 8) for p in prompts]
    outs = eng.run()
    for ref_out, rid in zip(seq, rids):
        assert outs[rid] == ref_out
