"""M6: tensor-parallel execution on a simulated 8-device CPU mesh.

Numerics on the virtual mesh are identical to a real pod slice; only
performance differs (SURVEY.md §4.2 item 4).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protoquant_tpu.models import LlamaModel, init_cache
from protoquant_tpu.nn import quantize_params
from protoquant_tpu.parallel import (
    build_tp_score,
    build_tp_step,
    make_mesh,
    make_tp_caches,
    shard_params,
    tp_model,
)
from protoquant_tpu.utils.config import MeshConfig, ModelConfig

# Subsystem matrix: full-coverage tier (fast tier: -m 'not slow').
pytestmark = pytest.mark.slow

CFG = ModelConfig(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=8,
    num_key_value_heads=4,
    max_position_embeddings=64,
)

needs_8dev = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


@pytest.fixture(scope="module")
def fp_setup():
    model = LlamaModel(CFG, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    return model, params


@needs_8dev
@pytest.mark.parametrize("dp,tp", [(1, 4), (2, 4), (4, 2)])
def test_tp_score_matches_single_device_fp(fp_setup, dp, tp):
    """fp mode is mathematically identical under TP (psum == full sum)."""
    single_model, params = fp_setup
    tokens = jnp.asarray(
        np.random.default_rng(1).integers(0, CFG.vocab_size, (dp * 2, 10)), jnp.int32
    )
    ref = np.asarray(single_model.apply(params, tokens))

    mesh = make_mesh(MeshConfig(dp=dp, tp=tp), jax.devices()[: dp * tp])
    model_tp = tp_model(CFG, "fp", mesh, dtype=jnp.float32)
    sparams = shard_params(params, mesh)
    with mesh:
        got = np.asarray(build_tp_score(model_tp, mesh, params)(sparams, tokens))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@needs_8dev
def test_tp_weight_only_matches_single_device(fp_setup):
    single_model, fp_params = fp_setup
    qparams = quantize_params(fp_params)
    tokens = jnp.asarray(
        np.random.default_rng(2).integers(0, CFG.vocab_size, (2, 8)), jnp.int32
    )
    ref = np.asarray(
        LlamaModel(CFG, mode="weight_only", dtype=jnp.float32).apply(qparams, tokens)
    )

    mesh = make_mesh(MeshConfig(dp=1, tp=4), jax.devices()[:4])
    model_tp = tp_model(CFG, "weight_only", mesh, dtype=jnp.float32)
    sparams = shard_params(qparams, mesh)
    with mesh:
        got = np.asarray(build_tp_score(model_tp, mesh, qparams)(sparams, tokens))
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


@needs_8dev
def test_tp_dynamic_int8_close_to_single_device(fp_setup):
    """Dynamic mode: per-shard activation scales differ from single-device
    full-row scales (standard row-wise TP quantization), so compare by
    cosine/top-1 rather than exact match."""
    single_model, fp_params = fp_setup
    qparams = quantize_params(fp_params)
    tokens = jnp.asarray(
        np.random.default_rng(3).integers(0, CFG.vocab_size, (2, 8)), jnp.int32
    )
    ref = np.asarray(
        LlamaModel(CFG, mode="dynamic", dtype=jnp.float32).apply(qparams, tokens)
    )

    mesh = make_mesh(MeshConfig(dp=1, tp=4), jax.devices()[:4])
    model_tp = tp_model(CFG, "dynamic", mesh, dtype=jnp.float32)
    sparams = shard_params(qparams, mesh)
    with mesh:
        got = np.asarray(build_tp_score(model_tp, mesh, qparams)(sparams, tokens))
    cos = np.sum(ref * got) / (np.linalg.norm(ref) * np.linalg.norm(got) + 1e-12)
    assert cos > 0.995, cos
    agree = np.mean(np.argmax(ref, -1) == np.argmax(got, -1))
    assert agree > 0.85, agree


@needs_8dev
@pytest.mark.parametrize("kv_dtype", [jnp.float32, jnp.int8])
def test_tp_decode_step_with_cache(fp_setup, kv_dtype):
    """Full prefill+decode under shard_map with sharded KV cache."""
    single_model, fp_params = fp_setup
    mesh = make_mesh(MeshConfig(dp=2, tp=4), jax.devices()[:8])
    model_tp = tp_model(CFG, "fp", mesh, dtype=jnp.float32)
    B, T = 2, 6
    caches = make_tp_caches(CFG, mesh, B, 32, kv_dtype)
    step = build_tp_step(model_tp, mesh, fp_params, caches)

    sparams = shard_params(fp_params, mesh)
    tokens = jnp.asarray(
        np.random.default_rng(4).integers(0, CFG.vocab_size, (B, T)), jnp.int32
    )
    positions = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    advance = jnp.full((B,), T, jnp.int32)
    with mesh:
        logits, caches = step(sparams, tokens, positions, caches, advance)
        np.testing.assert_array_equal(np.asarray(caches[0].lengths), [T, T])

        # one decode token
        nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
        pos2 = caches[0].lengths[:, None]
        logits2, caches = step(sparams, nxt, pos2, caches, jnp.ones((B,), jnp.int32))
    assert logits2.shape == (B, 1, CFG.vocab_size)
    np.testing.assert_array_equal(np.asarray(caches[0].lengths), [T + 1, T + 1])

    # Reference: same stream on a single device.
    if kv_dtype == jnp.float32:
        ref_caches = init_cache(CFG, B, 32, kv_dtype=jnp.float32)
        ref_logits, ref_caches = single_model.apply(
            fp_params, tokens, positions, ref_caches
        )
        ref2, _ = single_model.apply(
            fp_params, nxt, ref_caches[0].lengths[:, None], ref_caches
        )
        np.testing.assert_allclose(
            np.asarray(logits2), np.asarray(ref2), rtol=5e-4, atol=5e-4
        )


@needs_8dev
def test_sequence_parallel_score_matches_single_device(fp_setup):
    """SP (token-sharded norm regions + reduce-scatter/all-gather around the
    TP blocks) == plain TP == single device, fp mode."""
    single_model, params = fp_setup
    tokens = jnp.asarray(
        np.random.default_rng(7).integers(0, CFG.vocab_size, (2, 16)), jnp.int32
    )
    ref = np.asarray(single_model.apply(params, tokens))

    mesh = make_mesh(MeshConfig(dp=1, tp=4), jax.devices()[:4])
    model_sp = tp_model(CFG, "fp", mesh, dtype=jnp.float32, sp=True)
    sparams = shard_params(params, mesh)
    with mesh:
        got = np.asarray(build_tp_score(model_sp, mesh, params)(sparams, tokens))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


@needs_8dev
def test_sequence_parallel_dynamic_int8_gathers_match_tp(fp_setup):
    """Dynamic SP: the int8-on-the-wire gather (quantize-then-all_gather)
    must reproduce the plain dynamic TP model — per-token rowquant scales
    make quantize-then-gather bit-identical to gather-then-quantize, so the
    only differences left are f32 reduction orders (VERDICT round-1 item 6)."""
    single_model, fp_params = fp_setup
    qparams = quantize_params(fp_params)
    tokens = jnp.asarray(
        np.random.default_rng(8).integers(0, CFG.vocab_size, (2, 16)), jnp.int32
    )
    mesh = make_mesh(MeshConfig(dp=1, tp=4), jax.devices()[:4])
    sparams = shard_params(qparams, mesh)
    model_tp = tp_model(CFG, "dynamic", mesh, dtype=jnp.float32)
    model_sp = tp_model(CFG, "dynamic", mesh, dtype=jnp.float32, sp=True)
    with mesh:
        ref = np.asarray(build_tp_score(model_tp, mesh, qparams)(sparams, tokens))
        got = np.asarray(build_tp_score(model_sp, mesh, qparams)(sparams, tokens))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@needs_8dev
def test_tp_int4_weight_only_matches_single_device(fp_setup):
    """int4 + TP: group-wise 2D scales shard correctly in both parallel
    orientations (column: N; row: group rows with K)."""
    from protoquant_tpu.utils.config import QuantConfig

    single_model, fp_params = fp_setup
    qparams = quantize_params(fp_params, QuantConfig(mode="weight_only_int4", int4_group=16))
    tokens = jnp.asarray(
        np.random.default_rng(13).integers(0, CFG.vocab_size, (2, 8)), jnp.int32
    )
    ref = np.asarray(
        LlamaModel(CFG, mode="weight_only_int4", dtype=jnp.float32, int4_group=16).apply(
            qparams, tokens
        )
    )

    mesh = make_mesh(MeshConfig(dp=1, tp=2), jax.devices()[:2])
    model_tp = tp_model(CFG, "weight_only_int4", mesh, dtype=jnp.float32, int4_group=16)
    sparams = shard_params(qparams, mesh)
    with mesh:
        got = np.asarray(build_tp_score(model_tp, mesh, qparams)(sparams, tokens))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


@needs_8dev
def test_tp_w4a8_matches_single_device(fp_setup):
    """dynamic_int4 (W4A8) + TP: the packed payload and group-wise scales
    shard like wo4's; per-row activation scales recompute per shard."""
    from protoquant_tpu.utils.config import QuantConfig

    single_model, fp_params = fp_setup
    qparams = quantize_params(
        fp_params, QuantConfig(mode="dynamic_int4", int4_group=16)
    )
    tokens = jnp.asarray(
        np.random.default_rng(14).integers(0, CFG.vocab_size, (2, 8)),
        jnp.int32,
    )
    ref = np.asarray(
        LlamaModel(CFG, mode="dynamic_int4", dtype=jnp.float32,
                   int4_group=16).apply(qparams, tokens)
    )

    mesh = make_mesh(MeshConfig(dp=1, tp=2), jax.devices()[:2])
    model_tp = tp_model(CFG, "dynamic_int4", mesh, dtype=jnp.float32,
                        int4_group=16)
    sparams = shard_params(qparams, mesh)
    with mesh:
        got = np.asarray(build_tp_score(model_tp, mesh, qparams)(sparams, tokens))
    # Dynamic activation scales differ between the sharded row-parallel
    # halves and the single-device contraction, so this is close, not exact.
    cos = (got * ref).sum() / (np.linalg.norm(got) * np.linalg.norm(ref) + 1e-12)
    assert cos > 0.999, cos


@needs_8dev
@pytest.mark.parametrize("mode", ["fp", "weight_only"])
def test_pipeline_parallel_score_matches_single_device(mode):
    """GPipe-style 2-stage pipeline (stacked-layer stages, microbatch ring)
    == single device."""
    from jax.sharding import Mesh
    from protoquant_tpu.parallel.pipeline import build_pp_score, stack_layer_params
    from protoquant_tpu.utils.config import QuantConfig

    cfg = ModelConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64,
    )
    single = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = single.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    if mode != "fp":
        params = quantize_params(params, QuantConfig(mode=mode))
        single = LlamaModel(cfg, mode=mode, dtype=jnp.float32)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, 128, (4, 16)), jnp.int32
    )
    ref = np.asarray(single.apply(params, tokens))

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("pipe",))
    sp = stack_layer_params(params, 4)
    fwd = build_pp_score(cfg, mode, mesh, sp, dtype=jnp.float32)
    with mesh:
        got = np.asarray(fwd(sp, tokens))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


@needs_8dev
def test_tp_engine_matches_single_device_engine(fp_setup):
    """Continuous-batching engine on a (1, tp=4) mesh == plain engine
    (fp mode exact; sharded weights + sharded int8... here fp32 KV)."""
    from protoquant_tpu.engine import Engine, EngineConfig

    single_model, params = fp_setup
    ecfg = EngineConfig(
        max_batch_size=4, max_seq_len=32, prefill_chunk=16,
        max_new_tokens=6, temperature=0.0,
    )
    prompts = [[3, 17, 5, 9], [1, 2, 3], [7, 8, 9, 10, 11]]

    ref_eng = Engine(single_model, params, ecfg, kv_dtype=jnp.float32)
    ref_rids = [ref_eng.add_request(p, 6) for p in prompts]
    ref_outs = ref_eng.run()

    mesh = make_mesh(MeshConfig(dp=1, tp=4), jax.devices()[:4])
    model_tp = tp_model(CFG, "fp", mesh, dtype=jnp.float32)
    sparams = shard_params(params, mesh)
    with mesh:
        eng = Engine(model_tp, sparams, ecfg, kv_dtype=jnp.float32, mesh=mesh)
        rids = [eng.add_request(p, 6) for p in prompts]
        outs = eng.run()
    for ra, rb in zip(ref_rids, rids):
        assert ref_outs[ra] == outs[rb], (ref_outs[ra], outs[rb])


@needs_8dev
def test_dp_tp_engine_matches_single_device_engine(fp_setup):
    """dp>1 replica serving: a (2, 4) mesh batch-shards the slots — six
    requests through 4 slots (slot reuse on both replicas) must reproduce
    the single-device engine exactly (VERDICT round-1 item 5)."""
    from protoquant_tpu.engine import Engine, EngineConfig

    single_model, params = fp_setup
    ecfg = EngineConfig(
        max_batch_size=4, max_seq_len=32, prefill_chunk=16,
        max_new_tokens=6, temperature=0.0,
    )
    rng = np.random.default_rng(11)
    prompts = [
        list(map(int, rng.integers(1, CFG.vocab_size, rng.integers(3, 10))))
        for _ in range(6)
    ]

    ref_eng = Engine(single_model, params, ecfg, kv_dtype=jnp.float32)
    ref_rids = [ref_eng.add_request(p, 6) for p in prompts]
    ref_outs = ref_eng.run()

    mesh = make_mesh(MeshConfig(dp=2, tp=4), jax.devices()[:8])
    model_tp = tp_model(CFG, "fp", mesh, dtype=jnp.float32)
    sparams = shard_params(params, mesh)
    with mesh:
        eng = Engine(model_tp, sparams, ecfg, kv_dtype=jnp.float32, mesh=mesh)
        rids = [eng.add_request(p, 6) for p in prompts]
        outs = eng.run()
    for ra, rb in zip(ref_rids, rids):
        assert ref_outs[ra] == outs[rb], (ref_outs[ra], outs[rb])


@needs_8dev
def test_paged_tp_engine_matches_single_device_paged(fp_setup):
    """Paged int8 KV under a TP mesh: page pools shard on the kv-head axis;
    outputs match the single-device paged engine (VERDICT round-1 item 5)."""
    from protoquant_tpu.engine import Engine, EngineConfig

    single_model, params = fp_setup
    ecfg = EngineConfig(
        max_batch_size=4, max_seq_len=32, page_size=8, prefill_chunk=16,
        max_new_tokens=6, temperature=0.0,
    )
    prompts = [[3, 17, 5, 9], [1, 2, 3], [7, 8, 9, 10, 11], [2, 4, 6]]

    ref_eng = Engine(single_model, params, ecfg, kv_layout="paged")
    ref_rids = [ref_eng.add_request(p, 6) for p in prompts]
    ref_outs = ref_eng.run()

    mesh = make_mesh(MeshConfig(dp=1, tp=4), jax.devices()[:4])
    model_tp = tp_model(CFG, "fp", mesh, dtype=jnp.float32)
    sparams = shard_params(params, mesh)
    with mesh:
        eng = Engine(model_tp, sparams, ecfg, kv_layout="paged", mesh=mesh)
        rids = [eng.add_request(p, 6) for p in prompts]
        outs = eng.run()
    for ra, rb in zip(ref_rids, rids):
        assert ref_outs[ra] == outs[rb], (ref_outs[ra], outs[rb])


@needs_8dev
def test_paged_dp_tp_engine_matches_single_device_paged(fp_setup):
    """Paged int8 KV under a dp=2 x tp=4 mesh: each batch-sharded replica
    owns an independent page pool (pools shard over data, table entries are
    replica-local, one host allocator per replica) — outputs match the
    single-device paged engine (VERDICT round-2 item 3a)."""
    from protoquant_tpu.engine import Engine, EngineConfig

    single_model, params = fp_setup
    ecfg = EngineConfig(
        max_batch_size=4, max_seq_len=32, page_size=8, prefill_chunk=16,
        max_new_tokens=6, temperature=0.0,
    )
    rng = np.random.default_rng(13)
    # 6 requests > 4 slots: slot recycling exercises per-replica free lists.
    prompts = [
        list(map(int, rng.integers(1, CFG.vocab_size, rng.integers(3, 10))))
        for _ in range(6)
    ]

    ref_eng = Engine(single_model, params, ecfg, kv_layout="paged")
    ref_rids = [ref_eng.add_request(p, 6) for p in prompts]
    ref_outs = ref_eng.run()

    mesh = make_mesh(MeshConfig(dp=2, tp=4), jax.devices()[:8])
    model_tp = tp_model(CFG, "fp", mesh, dtype=jnp.float32)
    sparams = shard_params(params, mesh)
    with mesh:
        eng = Engine(model_tp, sparams, ecfg, kv_layout="paged", mesh=mesh)
        rids = [eng.add_request(p, 6) for p in prompts]
        outs = eng.run()
        # Every page freed back to its owning replica's pool.
        assert eng.metrics()["kv_pages_free"] == eng.metrics()["kv_pages_total"]
    for ra, rb in zip(ref_rids, rids):
        assert ref_outs[ra] == outs[rb], (ref_outs[ra], outs[rb])


MLA_CFG = ModelConfig(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=4,
    max_position_embeddings=64,
    rope_interleave=True,
    kv_lora_rank=16,
    q_lora_rank=24,
    qk_nope_head_dim=16,
    qk_rope_head_dim=8,
    v_head_dim=16,
)


@needs_8dev
@pytest.mark.parametrize("kv_dtype", [jnp.float32, jnp.int8])
def test_tp_mla_decode_matches_single_device(kv_dtype):
    """MLA under TP: q_b/kv_b column-parallel over heads, kv_a/q_a and the
    latent cache replicated, o_proj row-parallel psum — prefill + decode
    through the latent cache == single device."""
    single = LlamaModel(MLA_CFG, mode="fp", dtype=jnp.float32)
    params = single.init(jax.random.PRNGKey(2), jnp.zeros((1, 4), jnp.int32))
    mesh = make_mesh(MeshConfig(dp=2, tp=2), jax.devices()[:4])
    model_tp = tp_model(MLA_CFG, "fp", mesh, dtype=jnp.float32)
    B, T = 2, 6
    caches = make_tp_caches(MLA_CFG, mesh, B, 32, kv_dtype)
    step = build_tp_step(model_tp, mesh, params, caches)
    sparams = shard_params(params, mesh)
    tokens = jnp.asarray(
        np.random.default_rng(9).integers(0, MLA_CFG.vocab_size, (B, T)),
        jnp.int32,
    )
    positions = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    with mesh:
        logits, caches = step(
            sparams, tokens, positions, caches, jnp.full((B,), T, jnp.int32)
        )
        nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
        logits2, caches = step(
            sparams, nxt, caches[0].lengths[:, None], caches,
            jnp.ones((B,), jnp.int32),
        )
    assert logits2.shape == (B, 1, MLA_CFG.vocab_size)

    ref_caches = init_cache(MLA_CFG, B, 32, kv_dtype=kv_dtype)
    ref_logits, ref_caches = single.apply(params, tokens, positions, ref_caches)
    ref2, _ = single.apply(params, nxt, ref_caches[0].lengths[:, None], ref_caches)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), rtol=5e-4, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(logits2), np.asarray(ref2), rtol=5e-4, atol=5e-4
    )


@needs_8dev
def test_tp_mla_dynamic_int8_close_to_single_device():
    """Dynamic-int8 MLA under TP tracks the single-device quantized model."""
    fp = LlamaModel(MLA_CFG, mode="fp", dtype=jnp.float32)
    params = fp.init(jax.random.PRNGKey(3), jnp.zeros((1, 4), jnp.int32))
    qp = quantize_params(params)
    single = LlamaModel(MLA_CFG, mode="dynamic", dtype=jnp.float32)
    tokens = jnp.asarray(
        np.random.default_rng(10).integers(0, MLA_CFG.vocab_size, (2, 8)),
        jnp.int32,
    )
    ref = np.asarray(single.apply(qp, tokens))

    mesh = make_mesh(MeshConfig(dp=1, tp=2), jax.devices()[:2])
    model_tp = tp_model(MLA_CFG, "dynamic", mesh, dtype=jnp.float32)
    sparams = shard_params(qp, mesh)
    with mesh:
        got = np.asarray(build_tp_score(model_tp, mesh, qp)(sparams, tokens))
    # Row-parallel o_proj quantizes its LOCAL head shard per token, so TP is
    # close-not-exact in dynamic mode (same as the GQA dynamic TP test).
    cos = np.sum(ref * got) / (np.linalg.norm(ref) * np.linalg.norm(got) + 1e-12)
    assert cos > 0.995, cos
    agree = np.mean(np.argmax(ref, -1) == np.argmax(got, -1))
    assert agree > 0.85, agree


@needs_8dev
def test_repetition_penalty_dp_tp_engine_matches_single_device(fp_setup):
    """Repetition penalty under a dp=2 x tp=2 mesh: the [B, V] count buffer
    shards over data with its slots; greedy outputs match the single-device
    penalized engine exactly (VERDICT round-2 mesh-hole list)."""
    from protoquant_tpu.engine import Engine, EngineConfig

    single_model, params = fp_setup
    ecfg = EngineConfig(
        max_batch_size=4, max_seq_len=32, prefill_chunk=16,
        max_new_tokens=8, temperature=0.0, repetition_penalty=1.4,
    )
    prompts = [[3, 17, 5, 9], [1, 2, 3], [7, 8, 9, 10, 11], [2, 4, 6]]

    ref_eng = Engine(single_model, params, ecfg, kv_dtype=jnp.float32)
    ref_rids = [ref_eng.add_request(p, 8) for p in prompts]
    ref_outs = ref_eng.run()

    mesh = make_mesh(MeshConfig(dp=2, tp=2), jax.devices()[:4])
    model_tp = tp_model(CFG, "fp", mesh, dtype=jnp.float32)
    sparams = shard_params(params, mesh)
    with mesh:
        eng = Engine(model_tp, sparams, ecfg, kv_dtype=jnp.float32, mesh=mesh)
        rids = [eng.add_request(p, 8) for p in prompts]
        outs = eng.run()
    for ra, rb in zip(ref_rids, rids):
        assert ref_outs[ra] == outs[rb], (ref_outs[ra], outs[rb])

    # Control: the penalty changed the stream vs the unpenalized engine.
    plain = Engine(
        single_model, params,
        EngineConfig(max_batch_size=4, max_seq_len=32, prefill_chunk=16,
                     max_new_tokens=8, temperature=0.0),
        kv_dtype=jnp.float32,
    )
    pr = [plain.add_request(p, 8) for p in prompts]
    pouts = plain.run()
    assert any(pouts[a] != ref_outs[b] for a, b in zip(pr, ref_rids))


@needs_8dev
def test_speculative_tp_engine_matches_single_device(fp_setup):
    """Draft-model speculation on a TP-only (dp=1, tp=4) mesh: the draft
    stays replicated, the target's score-and-accept runs under shard_map —
    outputs exactly equal the plain single-device greedy engine, and
    speculation actually commits multi-token ticks (VERDICT round-2 item 3b)."""
    from protoquant_tpu.engine import Engine, EngineConfig

    single_model, params = fp_setup
    ecfg = EngineConfig(
        max_batch_size=4, max_seq_len=32, prefill_chunk=16,
        max_new_tokens=8, temperature=0.0,
    )
    prompts = [[3, 17, 5, 9], [1, 2, 3], [7, 8, 9, 10, 11]]

    plain = Engine(single_model, params, ecfg, kv_dtype=jnp.float32)
    plain_rids = [plain.add_request(p, 8) for p in prompts]
    plain_outs = plain.run()

    mesh = make_mesh(MeshConfig(dp=1, tp=4), jax.devices()[:4])
    model_tp = tp_model(CFG, "fp", mesh, dtype=jnp.float32)
    sparams = shard_params(params, mesh)
    with mesh:
        # Perfect draft = the single-device model on replicated params.
        eng = Engine(
            model_tp, sparams, ecfg, kv_dtype=jnp.float32, mesh=mesh,
            draft_model=single_model, draft_params=params, gamma=3,
        )
        rids = [eng.add_request(p, 8) for p in prompts]
        outs = eng.run()
    for ra, rb in zip(plain_rids, rids):
        assert plain_outs[ra] == outs[rb], (plain_outs[ra], outs[rb])
    m = eng.metrics()
    assert m["spec_acceptance_rate"] > 0.9, m
    assert eng.stats["steps"] < eng.stats["tokens_generated"], eng.stats


@needs_8dev
def test_prompt_lookup_tp_engine_matches_single_device(fp_setup):
    """Prompt-lookup speculation on a TP-only mesh == plain greedy engine."""
    from protoquant_tpu.engine import Engine, EngineConfig

    single_model, params = fp_setup
    ecfg = EngineConfig(
        max_batch_size=2, max_seq_len=32, prefill_chunk=16,
        max_new_tokens=8, temperature=0.0,
    )
    # Repetitive prompts give the n-gram matcher something to copy.
    prompts = [[5, 6, 7, 5, 6, 7, 5, 6], [9, 2, 9, 2, 9, 2]]

    plain = Engine(single_model, params, ecfg, kv_dtype=jnp.float32)
    plain_rids = [plain.add_request(p, 8) for p in prompts]
    plain_outs = plain.run()

    mesh = make_mesh(MeshConfig(dp=1, tp=4), jax.devices()[:4])
    model_tp = tp_model(CFG, "fp", mesh, dtype=jnp.float32)
    sparams = shard_params(params, mesh)
    with mesh:
        eng = Engine(
            model_tp, sparams, ecfg, kv_dtype=jnp.float32, mesh=mesh,
            prompt_lookup=3, gamma=3,
        )
        rids = [eng.add_request(p, 8) for p in prompts]
        outs = eng.run()
    for ra, rb in zip(plain_rids, rids):
        assert plain_outs[ra] == outs[rb], (plain_outs[ra], outs[rb])


@needs_8dev
def test_speculative_dp_tp_engine_matches_single_device(fp_setup):
    """Draft-model speculation under a dp=2 x tp=2 mesh: the draft stays
    replicated (proposes for the full batch outside the mesh); the target's
    score-and-accept runs batch-sharded — outputs exactly equal the plain
    single-device greedy engine (the last speculative mesh hole)."""
    from protoquant_tpu.engine import Engine, EngineConfig

    single_model, params = fp_setup
    ecfg = EngineConfig(
        max_batch_size=4, max_seq_len=32, prefill_chunk=16,
        max_new_tokens=8, temperature=0.0,
    )
    prompts = [[3, 17, 5, 9], [1, 2, 3], [7, 8, 9, 10, 11], [2, 4, 6]]

    plain = Engine(single_model, params, ecfg, kv_dtype=jnp.float32)
    plain_rids = [plain.add_request(p, 8) for p in prompts]
    plain_outs = plain.run()

    mesh = make_mesh(MeshConfig(dp=2, tp=2), jax.devices()[:4])
    model_tp = tp_model(CFG, "fp", mesh, dtype=jnp.float32)
    sparams = shard_params(params, mesh)
    with mesh:
        eng = Engine(
            model_tp, sparams, ecfg, kv_dtype=jnp.float32, mesh=mesh,
            draft_model=single_model, draft_params=params, gamma=3,
        )
        rids = [eng.add_request(p, 8) for p in prompts]
        outs = eng.run()
    for ra, rb in zip(plain_rids, rids):
        assert plain_outs[ra] == outs[rb], (plain_outs[ra], outs[rb])
    assert eng.metrics()["spec_acceptance_rate"] > 0.9, eng.metrics()


@needs_8dev
@pytest.mark.parametrize("dp,tp", [(1, 4), (2, 2)])
def test_eagle_mesh_engine_matches_single_device(fp_setup, dp, tp):
    """EAGLE feature-space drafting on dp x tp meshes: the one-layer draft
    stays replicated (its cache + feature anchors live outside the mesh);
    the base prefill returns owner-psum'd hidden chunks and the
    score-and-accept returns batch-sharded frontier features — outputs
    exactly equal the plain single-device greedy engine."""
    from protoquant_tpu.engine import Engine, EngineConfig
    from protoquant_tpu.models import init_eagle

    single_model, params = fp_setup
    ecfg = EngineConfig(
        max_batch_size=4, max_seq_len=48, prefill_chunk=16,
        max_new_tokens=8, temperature=0.0,
    )
    prompts = [[3, 17, 5, 9], [1, 2, 3], [7, 8, 9, 10, 11], [2, 4, 6]]

    plain = Engine(single_model, params, ecfg, kv_dtype=jnp.float32)
    plain_rids = [plain.add_request(p, 8) for p in prompts]
    plain_outs = plain.run()

    draft, dparams = init_eagle(
        single_model, jax.random.PRNGKey(7), dtype=jnp.float32,
        base_params=params,
    )
    mesh = make_mesh(MeshConfig(dp=dp, tp=tp), jax.devices()[: dp * tp])
    model_tp = tp_model(CFG, "fp", mesh, dtype=jnp.float32)
    sparams = shard_params(params, mesh)
    with mesh:
        eng = Engine(
            model_tp, sparams, ecfg, kv_dtype=jnp.float32, mesh=mesh,
            eagle_draft=draft, eagle_params=dparams, gamma=3,
        )
        rids = [eng.add_request(p, 8) for p in prompts]
        outs = eng.run()
    for ra, rb in zip(plain_rids, rids):
        assert plain_outs[ra] == outs[rb], (plain_outs[ra], outs[rb])


@needs_8dev
def test_ring_dp_tp_engine_matches_single_device(fp_setup):
    """Ring-layout (StreamingLLM window + sinks) serving under a dp=2 x
    tp=2 mesh: ring caches shard batch-over-data / heads-over-model like the
    dense cache — outputs match the single-device ring engine exactly
    (closes the last kv-layout mesh hole)."""
    from protoquant_tpu.engine import Engine, EngineConfig

    single_model, params = fp_setup
    ecfg = EngineConfig(
        max_batch_size=4, max_seq_len=64, prefill_chunk=8,
        max_new_tokens=10, temperature=0.0,
        stream_window=12, attention_sinks=4,
    )
    prompts = [[3, 17, 5, 9], [1, 2, 3], [7, 8, 9, 10, 11], [2, 4, 6]]

    ref_eng = Engine(single_model, params, ecfg, kv_dtype=jnp.int8,
                     kv_layout="ring")
    ref_rids = [ref_eng.add_request(p, 10) for p in prompts]
    ref_outs = ref_eng.run()

    mesh = make_mesh(MeshConfig(dp=2, tp=2), jax.devices()[:4])
    model_tp = tp_model(CFG, "fp", mesh, dtype=jnp.float32)
    sparams = shard_params(params, mesh)
    with mesh:
        eng = Engine(model_tp, sparams, ecfg, kv_dtype=jnp.int8,
                     kv_layout="ring", mesh=mesh)
        rids = [eng.add_request(p, 10) for p in prompts]
        outs = eng.run()
    for ra, rb in zip(ref_rids, rids):
        assert ref_outs[ra] == outs[rb], (ref_outs[ra], outs[rb])


@needs_8dev
def test_multi_lora_dp_tp_engine_matches_single_device(fp_setup):
    """Multi-LoRA serving under a dp=2 x tp=2 mesh: stacked adapters shard
    adapter-axis-replicated / feature-axis-with-their-parallelism
    (shardings.py lora rules), per-request adapter_ids thread through the
    shard_map extend+decode batch-sharded — each stream matches the
    single-device multi-LoRA engine exactly (closes the last mesh hole)."""
    from protoquant_tpu.engine import Engine, EngineConfig
    from protoquant_tpu.nn.lora import (
        attach_lora,
        attach_lora_stack,
        set_stack_adapter,
    )

    single_model, params = fp_setup
    RANK, TARGETS = 4, ("q_proj", "v_proj", "o_proj", "down_proj")
    rng_keyed = attach_lora(params, RANK, TARGETS, key=jax.random.PRNGKey(5))
    # Randomize B so the adapter actually changes the math.
    import numpy as _np

    def _randomize_b(tree, seed):
        r = _np.random.default_rng(seed)
        return jax.tree_util.tree_map_with_path(
            lambda path, a: jnp.asarray(
                r.normal(0, 0.2, a.shape).astype(_np.float32))
            if any(getattr(p, "key", None) == "lora_b" for p in path) else a,
            tree,
        )

    single1 = _randomize_b(rng_keyed, seed=31)
    stacked = set_stack_adapter(
        attach_lora_stack(params, RANK, 2, TARGETS), 1, single1
    )
    ecfg = EngineConfig(max_batch_size=4, max_seq_len=32, prefill_chunk=16,
                        max_new_tokens=6, temperature=0.0)
    prompts = [[3, 17, 5, 9], [1, 2, 3], [7, 8, 9, 10], [2, 4, 6]]
    aids = [0, 1, 1, 0]

    ref_model = LlamaModel(CFG, mode="fp", dtype=jnp.float32,
                           lora_rank=RANK, lora_targets=TARGETS, lora_stack=2)
    ref_eng = Engine(ref_model, stacked, ecfg, kv_dtype=jnp.float32)
    ref_rids = [ref_eng.add_request(p, 6, adapter_id=a)
                for p, a in zip(prompts, aids)]
    ref_outs = ref_eng.run()
    # The adapter changed the math vs base for the adapter-1 requests.
    base_eng = Engine(LlamaModel(CFG, mode="fp", dtype=jnp.float32),
                      params, ecfg, kv_dtype=jnp.float32)
    b1 = base_eng.add_request(prompts[1], 6)
    assert base_eng.run()[b1] != ref_outs[ref_rids[1]]

    mesh = make_mesh(MeshConfig(dp=2, tp=2), jax.devices()[:4])
    model_tp = tp_model(CFG, "fp", mesh, dtype=jnp.float32,
                        lora_rank=RANK, lora_targets=TARGETS, lora_stack=2)
    sparams = shard_params(stacked, mesh)
    with mesh:
        eng = Engine(model_tp, sparams, ecfg, kv_dtype=jnp.float32, mesh=mesh)
        rids = [eng.add_request(p, 6, adapter_id=a)
                for p, a in zip(prompts, aids)]
        outs = eng.run()
    for ra, rb in zip(ref_rids, rids):
        assert ref_outs[ra] == outs[rb], (ref_outs[ra], outs[rb])


@needs_8dev
def test_prefix_cache_dp_tp_engine(fp_setup):
    """Prefix caching under a dp=2 x tp=2 mesh: one prefix store per
    replica pool. Repeated prompts hit whenever they land on a replica
    that has served the prefix before; outputs stay exact."""
    from protoquant_tpu.engine import Engine, EngineConfig

    single_model, params = fp_setup
    ecfg = EngineConfig(
        max_batch_size=4, max_seq_len=32, page_size=8, prefill_chunk=8,
        max_new_tokens=4, temperature=0.0, prefix_cache=True,
    )
    prompt = list(range(1, 18))  # 17 tokens: 2 publishable full pages

    ref_eng = Engine(single_model, params, ecfg, kv_layout="paged")
    r0 = ref_eng.add_request(prompt, 4)
    ref = ref_eng.run()[r0]

    mesh = make_mesh(MeshConfig(dp=2, tp=2), jax.devices()[:4])
    model_tp = tp_model(CFG, "fp", mesh, dtype=jnp.float32)
    sparams = shard_params(params, mesh)
    with mesh:
        eng = Engine(model_tp, sparams, ecfg, kv_layout="paged", mesh=mesh)
        # Serve the same prompt 4 times sequentially: each replica serves it
        # at least once, and repeats on the same replica hit the cache.
        outs = []
        for _ in range(4):
            rid = eng.add_request(prompt, 4)
            outs.append(eng.run()[rid])
    assert all(o == ref for o in outs), (outs, ref)
    m = eng.metrics()
    assert m["prefix_hit_tokens"] > 0, m


@needs_8dev
@pytest.mark.parametrize("tp", [2, 4])
def test_tp_full_width_qk_norm_matches_single_device(tp):
    """OLMo-2's full-projection-width qk-norm under TP (round-4 guard
    lift): the variance psums across head shards and each rank slices its
    block of the replicated full-width weight — logits exactly match the
    single-device model."""
    cfg = ModelConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=64, post_norm=True, qk_norm=True,
        qk_norm_full=True,
    )
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    # Non-trivial norm weights (identity init would hide slice bugs).
    for ln in ("layers_0", "layers_1"):
        att = params["params"][ln]["self_attn"]
        for n in ("q_norm", "k_norm"):
            w = att[n]["weight"]
            att[n]["weight"] = w * (1.0 + 0.1 * jnp.arange(w.shape[0]))
    tokens = jnp.asarray(
        np.random.default_rng(5).integers(0, 128, (2, 10)), jnp.int32
    )
    ref = np.asarray(model.apply(params, tokens))

    mesh = make_mesh(MeshConfig(dp=1, tp=tp), jax.devices()[:tp])
    model_tp = tp_model(cfg, "fp", mesh, dtype=jnp.float32)
    sparams = shard_params(params, mesh)
    with mesh:
        got = np.asarray(build_tp_score(model_tp, mesh, params)(sparams, tokens))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@needs_8dev
def test_dp_tp_sampled_engine_matches_single_device(fp_setup):
    """Per-slot sampling keys (round 4): SAMPLED serving on a dp x tp mesh
    exactly equals the single-device engine — the draw chain depends only
    on each request's key, not on sharding (previously only greedy held
    across meshes)."""
    from protoquant_tpu.engine import Engine, EngineConfig

    single_model, params = fp_setup
    ecfg = EngineConfig(max_batch_size=4, max_seq_len=48, prefill_chunk=16,
                        max_new_tokens=8, temperature=0.8, top_k=8)
    prompts = [[3, 17, 5, 9], [1, 2, 3], [7, 8, 9, 10, 11], [2, 4, 6]]
    seeds = [11, 22, 33, 44]

    plain = Engine(single_model, params, ecfg, kv_dtype=jnp.float32)
    prids = [plain.add_request(p, 8, seed=s) for p, s in zip(prompts, seeds)]
    pouts = plain.run()

    mesh = make_mesh(MeshConfig(dp=2, tp=2), jax.devices()[:4])
    model_tp = tp_model(CFG, "fp", mesh, dtype=jnp.float32)
    sparams = shard_params(params, mesh)
    with mesh:
        eng = Engine(model_tp, sparams, ecfg, kv_dtype=jnp.float32,
                     mesh=mesh)
        rids = [eng.add_request(p, 8, seed=s)
                for p, s in zip(prompts, seeds)]
        outs = eng.run()
    for ra, rb in zip(prids, rids):
        assert pouts[ra] == outs[rb], (pouts[ra], outs[rb])


@needs_8dev
@pytest.mark.parametrize("dp,tp", [(1, 4), (2, 2)])
def test_eagle_tree_mesh_engine_matches_single_device(fp_setup, dp, tp):
    """EAGLE-TREE speculation (round 5) on dp x tp meshes: the replicated
    draft expands top-J candidate chains outside the mesh, the
    hidden-returning tree scorer runs under shard_map (candidate tree
    batch-sharded, branch compaction per replica shard, re-anchor hidden
    batch-sharded) — outputs exactly equal plain single-device greedy."""
    from protoquant_tpu.engine import Engine, EngineConfig
    from protoquant_tpu.models import init_eagle

    single_model, params = fp_setup
    ecfg = EngineConfig(
        max_batch_size=4, max_seq_len=48, prefill_chunk=16,
        max_new_tokens=8, temperature=0.0,
    )
    prompts = [[3, 17, 5, 9], [1, 2, 3], [7, 8, 9, 10, 11], [2, 4, 6]]

    plain = Engine(single_model, params, ecfg, kv_dtype=jnp.float32)
    plain_rids = [plain.add_request(p, 8) for p in prompts]
    plain_outs = plain.run()

    draft, dparams = init_eagle(
        single_model, jax.random.PRNGKey(7), dtype=jnp.float32,
        base_params=params,
    )
    mesh = make_mesh(MeshConfig(dp=dp, tp=tp), jax.devices()[: dp * tp])
    model_tp = tp_model(CFG, "fp", mesh, dtype=jnp.float32)
    sparams = shard_params(params, mesh)
    with mesh:
        eng = Engine(
            model_tp, sparams, ecfg, kv_dtype=jnp.float32, mesh=mesh,
            eagle_draft=draft, eagle_params=dparams, gamma=2,
            lookup_branches=3,
        )
        rids = [eng.add_request(p, 8) for p in prompts]
        outs = eng.run()
    for ra, rb in zip(plain_rids, rids):
        assert plain_outs[ra] == outs[rb], (plain_outs[ra], outs[rb])


@needs_8dev
def test_tree_ring_dp_tp_engine_matches_single_device(fp_setup):
    """TREE speculation on the RING layout under a dp=2 x tp=2 mesh
    (round 5: the two features must compose with each other AND with the
    mesh): candidate writes, ancestor-mask scoring, and the
    reorder_tail-through-_column compaction all run batch-sharded /
    head-sharded inside shard_map — streams match the single-device
    ring-tree engine exactly."""
    from protoquant_tpu.engine import Engine, EngineConfig

    single_model, params = fp_setup
    ecfg = EngineConfig(
        max_batch_size=4, max_seq_len=64, prefill_chunk=8,
        max_new_tokens=12, temperature=0.0,
        stream_window=16, attention_sinks=2,
    )
    prompts = [[3, 17, 5, 9, 3, 17, 5, 9], [1, 2, 3, 1, 2, 3],
               [7, 8, 9, 7, 8, 9], [2, 4, 2, 4, 2, 4]]
    spec = dict(prompt_lookup=2, lookup_branches=2, gamma=2)

    ref_eng = Engine(single_model, params, ecfg, kv_dtype=jnp.int8,
                     kv_layout="ring", **spec)
    ref_rids = [ref_eng.add_request(p, 12) for p in prompts]
    ref_outs = ref_eng.run()

    mesh = make_mesh(MeshConfig(dp=2, tp=2), jax.devices()[:4])
    model_tp = tp_model(CFG, "fp", mesh, dtype=jnp.float32)
    sparams = shard_params(params, mesh)
    with mesh:
        eng = Engine(model_tp, sparams, ecfg, kv_dtype=jnp.int8,
                     kv_layout="ring", mesh=mesh, **spec)
        rids = [eng.add_request(p, 12) for p in prompts]
        outs = eng.run()
    for ra, rb in zip(ref_rids, rids):
        assert ref_outs[ra] == outs[rb], (ref_outs[ra], outs[rb])
