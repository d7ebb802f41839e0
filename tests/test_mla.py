"""MLA (DeepSeek multi-head latent attention, models/mla.py).

Cross-framework logit parity lives in test_hf_parity.py; here:
* the absorbed cached path (prefill+decode through the latent cache) matches
  cacheless scoring exactly (fp cache) / closely (int8 latent cache),
* quantized weight modes run through MLA end-to-end,
* quantize_params converts the MLA projection set (incl. kv_b_proj's
  _Weight param) structurally.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protoquant_tpu.models import LlamaModel
from protoquant_tpu.models.llama import init_cache
from protoquant_tpu.models.mla import Int8MLACache, MLACache
from protoquant_tpu.nn import quantize_params
from protoquant_tpu.utils.config import ModelConfig, QuantConfig

# Subsystem matrix: full-coverage tier (fast tier: -m 'not slow').
pytestmark = pytest.mark.slow


def _cfg(**kw):
    base = dict(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, rope_interleave=True, kv_lora_rank=16,
        q_lora_rank=24, qk_nope_head_dim=16, qk_rope_head_dim=8,
        v_head_dim=16,
    )
    base.update(kw)
    return ModelConfig(**base)


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    B, T = 2, 10
    toks = jnp.asarray(
        np.random.default_rng(0).integers(0, 64, (B, T)), jnp.int32
    )
    fp = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = fp.init(jax.random.PRNGKey(0), toks)
    ref = fp.apply(params, toks)
    return cfg, B, T, toks, fp, params, ref


def _prefill_decode(model, params, cfg, toks, B, T, kv_dtype):
    caches = init_cache(cfg, B, 32, kv_dtype)
    pos = jnp.broadcast_to(jnp.arange(T - 1)[None], (B, T - 1))
    logits_p, caches = model.apply(params, toks[:, : T - 1], pos, caches)
    logits_d, caches = model.apply(
        params, toks[:, T - 1:], jnp.full((B, 1), T - 1, jnp.int32), caches
    )
    return logits_p, logits_d, caches


def test_mla_cache_classes_selected(setup):
    cfg, B, *_ = setup
    assert isinstance(init_cache(cfg, B, 32, jnp.float32)[0], MLACache)
    assert isinstance(init_cache(cfg, B, 32, jnp.int8)[0], Int8MLACache)
    # Latent cache bytes: (r + dr) per token vs 2*H*Dh-equivalent for MHA.
    c = init_cache(cfg, B, 32, jnp.int8)[0]
    assert c.cq.shape == (B, 32, cfg.kv_lora_rank)
    assert c.pq.shape == (B, 32, cfg.qk_rope_head_dim)


def test_mla_absorbed_decode_matches_scoring_fp(setup):
    """The absorbed form (q-side kv_b fold + latent attention) is the same
    math as the materialized form up to f32 reassociation."""
    cfg, B, T, toks, fp, params, ref = setup
    logits_p, logits_d, _ = _prefill_decode(fp, params, cfg, toks, B, T,
                                            jnp.float32)
    np.testing.assert_allclose(
        np.asarray(logits_p[:, -1]), np.asarray(ref[:, -2]), atol=2e-5,
        rtol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(logits_d[:, 0]), np.asarray(ref[:, -1]), atol=2e-5,
        rtol=2e-5,
    )


def test_mla_int8_latent_cache_close(setup):
    cfg, B, T, toks, fp, params, ref = setup
    _, logits_d, caches = _prefill_decode(fp, params, cfg, toks, B, T,
                                          jnp.int8)
    np.testing.assert_allclose(
        np.asarray(logits_d[:, 0]), np.asarray(ref[:, -1]), atol=0.08,
        rtol=0.08,
    )
    assert caches[0].cq.dtype == jnp.int8
    assert int(caches[0].lengths[0]) == T


@pytest.mark.parametrize("mode", ["dynamic", "weight_only"])
def test_mla_quantized_modes(setup, mode):
    cfg, B, T, toks, fp, params, ref = setup
    q = LlamaModel(cfg, mode=mode, dtype=jnp.float32)
    qp = quantize_params(params, QuantConfig(mode=mode))
    scoring = q.apply(qp, toks)
    pos = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    caches = init_cache(cfg, B, 32, jnp.int8)
    cached, _ = q.apply(qp, toks, pos, caches)
    assert np.isfinite(np.asarray(cached)).all()
    # Quantized scoring tracks fp scoring; cached tracks quantized scoring.
    assert np.abs(np.asarray(scoring) - np.asarray(ref)).max() < 0.5
    assert np.abs(np.asarray(cached) - np.asarray(scoring)).max() < 0.15


def test_mla_quantize_params_converts_all_projections(setup):
    from protoquant_tpu.core.qtensor import QTensor

    cfg, B, T, toks, fp, params, ref = setup
    qp = quantize_params(params, QuantConfig(mode="weight_only"))
    attn = qp["params"]["layers_0"]["self_attn"]
    for name in ("q_a_proj", "q_b_proj", "kv_a_proj_with_mqa", "kv_b_proj",
                 "o_proj"):
        assert isinstance(attn[name]["qkernel"], QTensor), name
    # a-layernorms stay fp vectors.
    assert attn["kv_a_layernorm"]["weight"].dtype == jnp.float32


def test_mla_no_q_compression_variant():
    """V2-Lite style: q_lora_rank=0 uses a single full q_proj."""
    cfg = _cfg(q_lora_rank=0)
    toks = jnp.asarray(
        np.random.default_rng(1).integers(0, 64, (2, 6)), jnp.int32
    )
    fp = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = fp.init(jax.random.PRNGKey(1), toks)
    assert "q_proj" in params["params"]["layers_0"]["self_attn"]
    assert "q_a_proj" not in params["params"]["layers_0"]["self_attn"]
    ref = fp.apply(params, toks)
    logits_p, logits_d, _ = _prefill_decode(fp, params, cfg, toks, 2, 6,
                                            jnp.float32)
    np.testing.assert_allclose(
        np.asarray(logits_d[:, 0]), np.asarray(ref[:, -1]), atol=2e-5,
        rtol=2e-5,
    )


def test_mla_engine_batched_matches_sequential():
    """MLA models serve through the continuous-batching Engine (dense
    latent cache): batched decoding across slot reuse equals one-request-
    at-a-time generation exactly — the same determinism invariant the
    GQA engines are held to (tests/test_engine.py)."""
    from protoquant_tpu.engine import Engine, EngineConfig

    cfg = _cfg(max_position_embeddings=128)
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    ecfg = EngineConfig(max_batch_size=3, max_seq_len=64, prefill_chunk=16,
                        max_new_tokens=12, temperature=0.0)
    prompts = [[5, 9, 2, 7], [1, 2, 3], [9, 8, 7, 6, 5], [4, 4]]

    seq_outs = []
    for p in prompts:
        e = Engine(model, params, ecfg, kv_dtype=jnp.float32)
        rid = e.add_request(p, 12)
        seq_outs.append(e.run()[rid])

    eng = Engine(model, params, ecfg, kv_dtype=jnp.float32)
    rids = [eng.add_request(p, 12) for p in prompts]
    outs = eng.run()
    for ref, rid in zip(seq_outs, rids):
        assert outs[rid] == ref, (outs[rid], ref)


def test_mla_engine_int8_latent_cache_runs():
    """The int8 latent cache serves through the Engine (quality is a
    latent-quantization question, covered by test_mla_int8_latent_cache_
    close; here: the serving path itself is wired)."""
    from protoquant_tpu.engine import Engine, EngineConfig

    cfg = _cfg(max_position_embeddings=128)
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=16,
                        max_new_tokens=8, temperature=0.0)
    eng = Engine(model, params, ecfg, kv_dtype=jnp.int8)
    rid = eng.add_request([5, 9, 2, 7], 8)
    out = eng.run()[rid]
    assert len(out) == 8 and all(0 <= t < 64 for t in out)


@pytest.mark.parametrize("kv_dtype", [jnp.float32, jnp.int8])
def test_mla_tree_speculation_matches_plain(kv_dtype):
    """Tree speculation on the LATENT cache (round-4 guard lift): ancestor
    masking over latent slots + reorder_tail on (c, p[, scales]) — the
    tree-lookup engine's stream equals plain greedy decoding exactly."""
    from protoquant_tpu.engine import Engine, EngineConfig

    cfg = _cfg(max_position_embeddings=128)
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=96, prefill_chunk=16,
                        max_new_tokens=24, temperature=0.0)
    prompts = [[5, 6, 7, 5, 6, 7, 5, 6], [9, 2, 9, 2, 9, 2]]

    plain = Engine(model, params, ecfg, kv_dtype=kv_dtype)
    prids = [plain.add_request(p, 24) for p in prompts]
    pouts = plain.run()

    eng = Engine(model, params, ecfg, kv_dtype=kv_dtype,
                 prompt_lookup=3, lookup_branches=3, gamma=3)
    rids = [eng.add_request(p, 24) for p in prompts]
    outs = eng.run()
    for ra, rb in zip(prids, rids):
        assert pouts[ra] == outs[rb], (pouts[ra], outs[rb])
    assert eng.stats["spec_accepted"] > 0
