"""LoRA adapters over quantized base weights (nn/lora.py + QLinear.lora_rank).

Gates: zero-B adapters are exactly the base model; a live adapter on the
quantized base matches the fp merged-kernel model within quantization error;
PEFT-layout import round-trips; TP sharding specs route adapter partials
through the base psum (exact-match on the simulated mesh).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protoquant_tpu.models import LlamaModel
from protoquant_tpu.nn import (
    attach_lora,
    import_hf_lora,
    merge_lora,
    quantize_params,
)
from protoquant_tpu.utils.config import ModelConfig

# Subsystem matrix: full-coverage tier (fast tier: -m 'not slow').
pytestmark = pytest.mark.slow

CFG = ModelConfig(
    vocab_size=64,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=64,
)
RANK = 4
TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj")


@pytest.fixture(scope="module")
def base():
    model = LlamaModel(CFG, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    rng = np.random.default_rng(3)
    toks = jnp.asarray(rng.integers(1, CFG.vocab_size, (2, 12)), jnp.int32)
    return model, params, toks


def _randomize_b(params, seed=7):
    """Give every adapter a non-zero B so it actually does something."""
    out = jax.tree_util.tree_map(lambda a: a, params)
    key = jax.random.PRNGKey(seed)

    def walk(node):
        nonlocal key
        if isinstance(node, dict):
            if "lora_b" in node:
                key, sk = jax.random.split(key)
                node["lora_b"] = (
                    jax.random.normal(sk, node["lora_b"].shape, jnp.float32) * 0.05
                )
            for v in node.values():
                walk(v)

    walk(out)
    return out


def test_lora_zero_b_is_base_model(base):
    model, params, toks = base
    ref = np.asarray(model.apply(params, toks))
    lmodel = LlamaModel(CFG, mode="fp", dtype=jnp.float32, lora_rank=RANK)
    lparams = attach_lora(params, RANK, TARGETS)
    out = np.asarray(lmodel.apply(lparams, toks))
    np.testing.assert_array_equal(out, ref)


def test_lora_matches_merged_fp(base):
    model, params, toks = base
    lparams = _randomize_b(attach_lora(params, RANK, TARGETS))
    lmodel = LlamaModel(CFG, mode="fp", dtype=jnp.float32, lora_rank=RANK)
    out = np.asarray(lmodel.apply(lparams, toks))

    merged = merge_lora(lparams, alpha=16.0)
    ref = np.asarray(model.apply(merged, toks))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
    # The adapter changed the model (B is non-zero).
    base_out = np.asarray(model.apply(params, toks))
    assert np.abs(ref - base_out).max() > 1e-3


def test_lora_on_quantized_base(base):
    """Adapter over the int8 base ~ fp merged model, within quant error of
    the same scale as the no-lora quantization error."""
    model, params, toks = base
    lparams_fp = _randomize_b(attach_lora(params, RANK, TARGETS))
    merged = merge_lora(lparams_fp, alpha=16.0)
    ref = np.asarray(model.apply(merged, toks))

    # Quantize the BASE, then attach the same adapters (quantize_params
    # passes lora_a/lora_b through untouched — they are not kernel leaves).
    qparams = quantize_params(lparams_fp)
    qmodel = LlamaModel(CFG, mode="dynamic", dtype=jnp.float32, lora_rank=RANK)
    out = np.asarray(qmodel.apply(qparams, toks))

    # Reference error scale: plain quantization of the merged model.
    plain = np.asarray(
        LlamaModel(CFG, mode="dynamic", dtype=jnp.float32).apply(
            quantize_params(merged), toks
        )
    )
    err_lora = np.mean((out - ref) ** 2)
    err_plain = np.mean((plain - ref) ** 2)
    assert err_lora < 4 * err_plain + 1e-6, (err_lora, err_plain)


def test_lora_hf_peft_import(base):
    model, params, toks = base
    lparams = attach_lora(params, RANK, ("q_proj", "v_proj"))
    rng = np.random.default_rng(11)
    sd = {}
    for i in range(CFG.num_hidden_layers):
        for proj in ("q_proj", "v_proj"):
            K = CFG.hidden_size
            N = lparams["params"][f"layers_{i}"]["self_attn"][proj][
                "lora_b"
            ].shape[1]
            sd[
                f"base_model.model.model.layers.{i}.self_attn.{proj}.lora_A.weight"
            ] = rng.normal(size=(RANK, K)).astype(np.float32)
            sd[
                f"base_model.model.model.layers.{i}.self_attn.{proj}.lora_B.weight"
            ] = rng.normal(size=(N, RANK)).astype(np.float32) * 0.05
    loaded = import_hf_lora(sd, lparams)
    a = loaded["params"]["layers_0"]["self_attn"]["q_proj"]["lora_a"]
    np.testing.assert_allclose(
        np.asarray(a),
        sd["base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight"].T,
    )
    # And the loaded adapter runs.
    lmodel = LlamaModel(
        CFG, mode="fp", dtype=jnp.float32, lora_rank=RANK,
        lora_targets=("q_proj", "v_proj"),
    )
    out = lmodel.apply(loaded, toks)
    assert np.all(np.isfinite(np.asarray(out)))


def test_lora_rank_mismatch_rejected(base):
    _, params, _ = base
    lparams = attach_lora(params, RANK, ("q_proj",))
    sd = {
        "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight":
            np.zeros((RANK + 1, CFG.hidden_size), np.float32)
    }
    with pytest.raises(ValueError, match="rank mismatch"):
        import_hf_lora(sd, lparams)


def test_lora_tp_exact(base):
    """LoRA partials reduce through the TP psum: the sharded model equals
    the single-device model exactly (fp mode, 2-way model mesh)."""
    from jax.sharding import PartitionSpec as P

    from protoquant_tpu.parallel import make_mesh, shard_params, tp_model
    from protoquant_tpu.parallel.shardings import params_pspecs
    from protoquant_tpu.utils.config import MeshConfig

    model, params, toks = base
    lparams = _randomize_b(attach_lora(params, RANK, TARGETS))
    lmodel = LlamaModel(CFG, mode="fp", dtype=jnp.float32, lora_rank=RANK)
    ref = np.asarray(lmodel.apply(lparams, toks))

    mesh = make_mesh(MeshConfig(dp=1, tp=2), jax.devices()[:2])
    tpm = tp_model(CFG, "fp", mesh, dtype=jnp.float32, lora_rank=RANK)
    sharded = shard_params(lparams, mesh)

    try:
        from jax import shard_map as _shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map as _shard_map

    pspecs = params_pspecs(lparams)
    fn = jax.jit(
        _shard_map(
            lambda p, t: tpm.apply(p, t),
            mesh=mesh,
            in_specs=(pspecs, P()),
            out_specs=P(),
            check_vma=False,
        )
    )
    out = np.asarray(fn(sharded, toks))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


# -- multi-LoRA: stacked adapters, per-request selection ----------------------


def test_multi_lora_engine_per_request(base):
    """Three requests with different adapter ids decode in ONE batch; each
    stream must equal the single-adapter engine serving that adapter alone."""
    from protoquant_tpu.engine import Engine, EngineConfig
    from protoquant_tpu.nn.lora import attach_lora_stack, set_stack_adapter

    model, params, _ = base
    prompts = [[3, 17, 5], [9, 2, 11, 4], [7, 7, 1]]

    # Build two distinct live adapters (slots 1 and 2; slot 0 stays base).
    single1 = _randomize_b(attach_lora(params, RANK, TARGETS), seed=21)
    single2 = _randomize_b(attach_lora(params, RANK, TARGETS), seed=22)
    stacked = attach_lora_stack(params, RANK, 3, TARGETS)
    stacked = set_stack_adapter(stacked, 1, single1)
    stacked = set_stack_adapter(stacked, 2, single2)

    ecfg = EngineConfig(max_batch_size=4, max_seq_len=64, prefill_chunk=16,
                        max_new_tokens=8, temperature=0.0)
    mmodel = LlamaModel(CFG, mode="fp", dtype=jnp.float32,
                        lora_rank=RANK, lora_stack=3)
    eng = Engine(mmodel, stacked, ecfg, kv_dtype=jnp.float32)
    rids = [
        eng.add_request(prompts[0], 8, adapter_id=0),
        eng.add_request(prompts[1], 8, adapter_id=1),
        eng.add_request(prompts[2], 8, adapter_id=2),
    ]
    outs = eng.run()

    # References: base model and each single-adapter model, served alone.
    smodel = LlamaModel(CFG, mode="fp", dtype=jnp.float32, lora_rank=RANK)
    base_eng = Engine(model, params, ecfg, kv_dtype=jnp.float32)
    r0 = base_eng.add_request(prompts[0], 8)
    assert outs[rids[0]] == base_eng.run()[r0]
    for sp, prompt, rid in ((single1, prompts[1], rids[1]),
                            (single2, prompts[2], rids[2])):
        e = Engine(smodel, sp, ecfg, kv_dtype=jnp.float32)
        r = e.add_request(prompt, 8)
        assert outs[rid] == e.run()[r], rid


def test_multi_lora_linear_speculation_matches_plain(base):
    """Multi-LoRA + draft-model speculation: the scoring forward applies
    per-slot adapters (the draft proposes adapter-blind — acceptance cost
    only, never exactness), so each adapted stream equals the plain
    multi-LoRA engine's exactly."""
    from protoquant_tpu.engine import Engine, EngineConfig
    from protoquant_tpu.nn.lora import attach_lora_stack, set_stack_adapter

    model, params, _ = base
    prompts = [[3, 17, 5], [9, 2, 11, 4]]
    single1 = _randomize_b(attach_lora(params, RANK, TARGETS), seed=31)
    stacked = attach_lora_stack(params, RANK, 2, TARGETS)
    stacked = set_stack_adapter(stacked, 1, single1)

    ecfg = EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=16,
                        max_new_tokens=8, temperature=0.0)
    mmodel = LlamaModel(CFG, mode="fp", dtype=jnp.float32,
                        lora_rank=RANK, lora_stack=2)
    plain = Engine(mmodel, stacked, ecfg, kv_dtype=jnp.float32)
    prids = [plain.add_request(prompts[0], 8, adapter_id=0),
             plain.add_request(prompts[1], 8, adapter_id=1)]
    pouts = plain.run()

    eng = Engine(mmodel, stacked, ecfg, kv_dtype=jnp.float32,
                 draft_model=model, draft_params=params, gamma=3)
    rids = [eng.add_request(prompts[0], 8, adapter_id=0),
            eng.add_request(prompts[1], 8, adapter_id=1)]
    outs = eng.run()
    for ra, rb in zip(prids, rids):
        assert pouts[ra] == outs[rb], (pouts[ra], outs[rb])


def test_multi_lora_paged_int8(base):
    """Multi-LoRA composes with the quantized paged engine. The reserved
    zero adapter is EXACTLY the base engine (delta is literally zero); a
    live adapter matches the single-adapter engine on a prefix — the
    batched adapter einsum and the 2D matmul may differ by 1 ulp, which
    int8 KV re-rounding can amplify into a tie-flip on random weights, so
    full-stream equality is not the right gate there."""
    from protoquant_tpu.engine import Engine, EngineConfig
    from protoquant_tpu.nn.lora import attach_lora_stack, set_stack_adapter

    model, params, _ = base
    qbase = quantize_params(params)
    single = _randomize_b(attach_lora(qbase, RANK, TARGETS), seed=31)
    stacked = set_stack_adapter(
        attach_lora_stack(qbase, RANK, 2, TARGETS), 1, single
    )
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=64, page_size=8,
                        prefill_chunk=16, max_new_tokens=8, temperature=0.0)
    mm = LlamaModel(CFG, mode="dynamic", dtype=jnp.float32,
                    lora_rank=RANK, lora_stack=2)

    # Zero adapter == base engine, exactly.
    eng0 = Engine(mm, stacked, ecfg, kv_dtype=jnp.int8, kv_layout="paged")
    r0 = eng0.add_request([5, 9, 2, 14], 8, adapter_id=0)
    out0 = eng0.run()[r0]
    bm = LlamaModel(CFG, mode="dynamic", dtype=jnp.float32)
    beng = Engine(bm, qbase, ecfg, kv_dtype=jnp.int8, kv_layout="paged")
    rb = beng.add_request([5, 9, 2, 14], 8)
    assert out0 == beng.run()[rb]

    # Live adapter: prefix agreement with the single-adapter engine.
    eng = Engine(mm, stacked, ecfg, kv_dtype=jnp.int8, kv_layout="paged")
    rid = eng.add_request([5, 9, 2, 14], 8, adapter_id=1)
    out = eng.run()[rid]
    sm = LlamaModel(CFG, mode="dynamic", dtype=jnp.float32, lora_rank=RANK)
    ref_eng = Engine(sm, single, ecfg, kv_dtype=jnp.int8, kv_layout="paged")
    r = ref_eng.add_request([5, 9, 2, 14], 8)
    ref = ref_eng.run()[r]
    assert out[:5] == ref[:5], (out, ref)
    assert out0 != out  # the adapter actually changed the stream


def test_multi_lora_guards(base):
    from protoquant_tpu.engine import Engine, EngineConfig

    model, params, _ = base
    # adapter_id on a non-multi-LoRA engine is rejected.
    eng = Engine(
        model, params,
        EngineConfig(max_batch_size=2, max_seq_len=64),
        kv_dtype=jnp.float32,
    )
    with pytest.raises(ValueError, match="lora_stack"):
        eng.add_request([1, 2, 3], 4, adapter_id=1)
    # Stacked params demand adapter_ids at the module level.
    from protoquant_tpu.nn.lora import attach_lora_stack

    stacked = attach_lora_stack(params, RANK, 2, TARGETS)
    mm = LlamaModel(CFG, mode="fp", dtype=jnp.float32,
                    lora_rank=RANK, lora_stack=2)
    with pytest.raises(ValueError, match="adapter_ids"):
        mm.apply(stacked, jnp.zeros((1, 4), jnp.int32))
