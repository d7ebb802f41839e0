"""Trained drafting heads (Medusa) — models/medusa.py + engine wiring.

Invariants:
- Whatever the heads propose, the engine's output equals plain greedy
  decoding token-for-token (greedy tree acceptance — same invariant as
  tests/test_tree_speculation.py, now with a learned proposal source).
- Training the heads on the model's own greedy streams (self-distillation)
  raises the engine's measured acceptance rate above the untrained heads'.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protoquant_tpu.engine import Engine, EngineConfig
from protoquant_tpu.models import LlamaModel, greedy_generate
from protoquant_tpu.models.medusa import (
    init_medusa,
    propose_from_heads,
    train_medusa_heads,
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
    max_position_embeddings=128,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = LlamaModel(CFG, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    return model, params


def test_heads_shapes_and_propose(model_and_params):
    model, _ = model_and_params
    heads, hp = init_medusa(model, depth=3, rng=jax.random.PRNGKey(1))
    h = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 5, CFG.hidden_size)),
        jnp.float32,
    )
    logits = heads.apply(hp, h)
    assert logits.shape == (2, 5, 3, CFG.vocab_size)
    assert logits.dtype == jnp.float32

    props = propose_from_heads(logits[:, -1], branches=4)
    assert props.shape == (2, 4, 3)
    # Branch 0 = head-1 argmax; branches have distinct first tokens.
    np.testing.assert_array_equal(
        np.asarray(props[:, 0, 0]), np.asarray(jnp.argmax(logits[:, -1, 0], -1))
    )
    for b in range(2):
        firsts = [int(t) for t in props[b, :, 0]]
        assert len(set(firsts)) == 4
        # Depths 2..d are the deeper heads' argmax on every branch.
        deep = np.asarray(jnp.argmax(logits[b, -1, 1:], -1))
        for j in range(4):
            np.testing.assert_array_equal(np.asarray(props[b, j, 1:]), deep)


def _self_distill_corpus(model, params, n_seqs=8, T=48, seed=7):
    """The model's own greedy continuations of random prompts — the text
    distribution the engine will actually decode, so head training on it
    must transfer to acceptance."""
    rng = np.random.default_rng(seed)
    prompts = jnp.asarray(rng.integers(1, CFG.vocab_size, (n_seqs, 8)),
                          jnp.int32)
    out = greedy_generate(model, params, prompts, T - 8, T + 8,
                          kv_dtype=jnp.float32)
    return jnp.concatenate([prompts, jnp.asarray(out, jnp.int32)], axis=1)


def test_head_training_reduces_loss(model_and_params):
    model, params = model_and_params
    heads, hp = init_medusa(model, depth=2, rng=jax.random.PRNGKey(2),
                            dtype=jnp.float32)
    corpus = _self_distill_corpus(model, params)
    batches = [corpus] * 30
    hp, losses = train_medusa_heads(model, params, heads, hp, batches,
                                    lr=3e-3)
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])


@pytest.mark.parametrize("kv_dtype", [jnp.float32, jnp.int8])
def test_medusa_engine_matches_plain_greedy(model_and_params, kv_dtype):
    """Exact-greedy invariant with UNTRAINED heads (worst-case proposals):
    acceptance only commits the target's own choices."""
    model, params = model_and_params
    heads, hp = init_medusa(model, depth=3, rng=jax.random.PRNGKey(3))
    ecfg = EngineConfig(max_batch_size=3, max_seq_len=96, prefill_chunk=16,
                        max_new_tokens=24, temperature=0.0)
    prompts = [[5, 6, 7, 5, 6, 7, 5, 6], [1, 2, 1, 2, 1, 2, 1],
               [9, 2, 9, 2, 9], [3, 3, 3, 3]]

    plain = Engine(model, params, ecfg, kv_dtype=kv_dtype)
    plain_rids = [plain.add_request(p, 24) for p in prompts]
    plain_outs = plain.run()

    eng = Engine(model, params, ecfg, kv_dtype=kv_dtype,
                 medusa_heads=heads, medusa_params=hp,
                 gamma=3, lookup_branches=3)
    rids = [eng.add_request(p, 24) for p in prompts]
    outs = eng.run()
    for ra, rb in zip(plain_rids, rids):
        assert plain_outs[ra] == outs[rb], (plain_outs[ra], outs[rb])


def test_trained_heads_raise_acceptance(model_and_params):
    """Self-distilled heads must out-accept untrained ones on the model's
    own streams — the whole point of the trained tier."""
    model, params = model_and_params
    corpus = _self_distill_corpus(model, params)

    def run(hp, heads):
        ecfg = EngineConfig(max_batch_size=2, max_seq_len=96,
                            prefill_chunk=16, max_new_tokens=32,
                            temperature=0.0)
        eng = Engine(model, params, ecfg, kv_dtype=jnp.float32,
                     medusa_heads=heads, medusa_params=hp,
                     gamma=2, lookup_branches=3)
        # Prompts drawn from the same distribution the corpus started from.
        rng = np.random.default_rng(11)
        for _ in range(2):
            eng.add_request([int(t) for t in rng.integers(1, CFG.vocab_size, 8)],
                            32)
        eng.run()
        return eng.metrics()["spec_acceptance_rate"]

    heads, hp0 = init_medusa(model, depth=2, rng=jax.random.PRNGKey(4),
                             dtype=jnp.float32)
    hp1, _ = train_medusa_heads(model, params, heads, hp0, [corpus] * 60,
                                lr=3e-3)
    untrained, trained = run(hp0, heads), run(hp1, heads)
    assert trained > untrained, (trained, untrained)
    assert trained > 0.1, trained


def test_medusa_guards(model_and_params):
    model, params = model_and_params
    heads, hp = init_medusa(model, depth=2)
    base = dict(kv_dtype=jnp.float32)
    with pytest.raises(ValueError, match="go together"):
        Engine(model, params, EngineConfig(max_batch_size=2, max_seq_len=64),
               medusa_heads=heads, **base)
    with pytest.raises(ValueError, match="exclusive"):
        Engine(model, params, EngineConfig(max_batch_size=2, max_seq_len=64),
               medusa_heads=heads, medusa_params=hp, prompt_lookup=2, **base)
    with pytest.raises(ValueError, match="depth"):
        Engine(model, params, EngineConfig(max_batch_size=2, max_seq_len=64),
               medusa_heads=heads, medusa_params=hp, gamma=4, **base)
    # adaptive_gamma composes with tree modes since round 5 (depth adapts
    # on measured acceptance) — constructing must succeed.
    eng = Engine(model, params,
                 EngineConfig(max_batch_size=2, max_seq_len=64),
                 medusa_heads=heads, medusa_params=hp, gamma=2,
                 adaptive_gamma=True, **base)
    assert eng.adaptive_gamma


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 virtual devices")
def test_medusa_dp_tp_engine_matches_single_device(model_and_params):
    """Medusa trees under a dp=2 x tp=2 mesh: the scoring forward returns
    hidden states inside shard_map, heads replicate, next proposals come
    back batch-sharded — outputs equal the single-device medusa engine
    (and therefore plain greedy) exactly."""
    jax.clear_caches()  # same XLA:CPU executable-pressure workaround as
    #                     test_tree_speculation's mesh test
    from protoquant_tpu.parallel import make_mesh, shard_params, tp_model
    from protoquant_tpu.utils.config import MeshConfig

    model, params = model_and_params
    heads, hp = init_medusa(model, depth=3, rng=jax.random.PRNGKey(5))
    ecfg = EngineConfig(max_batch_size=4, max_seq_len=96, prefill_chunk=16,
                        max_new_tokens=16, temperature=0.0)
    prompts = [[5, 6, 7, 5, 6, 7, 5, 6], [1, 2, 1, 2, 1, 2, 1],
               [9, 2, 9, 2, 9], [3, 3, 3, 3]]

    plain = Engine(model, params, ecfg, kv_dtype=jnp.float32)
    plain_rids = [plain.add_request(p, 16) for p in prompts]
    plain_outs = plain.run()

    mesh = make_mesh(MeshConfig(dp=2, tp=2), jax.devices()[:4])
    model_tp = tp_model(CFG, "fp", mesh, dtype=jnp.float32)
    sparams = shard_params(params, mesh)
    with mesh:
        eng = Engine(model_tp, sparams, ecfg, kv_dtype=jnp.float32,
                     mesh=mesh, medusa_heads=heads, medusa_params=hp,
                     gamma=3, lookup_branches=3)
        rids = [eng.add_request(p, 16) for p in prompts]
        outs = eng.run()
    for ra, rb in zip(plain_rids, rids):
        assert plain_outs[ra] == outs[rb], (plain_outs[ra], outs[rb])


def test_quantized_heads_keep_exact_greedy_and_accept(model_and_params):
    """Serving flow: train fp heads -> quantize_medusa -> int8-dynamic heads
    in the engine. Greedy-exactness is proposal-independent (still holds);
    the quantized heads' acceptance stays above the untrained floor."""
    from protoquant_tpu.models.medusa import quantize_medusa

    model, params = model_and_params
    corpus = _self_distill_corpus(model, params)
    heads, hp0 = init_medusa(model, depth=2, rng=jax.random.PRNGKey(8),
                             dtype=jnp.float32)
    hp, _ = train_medusa_heads(model, params, heads, hp0, [corpus] * 60,
                               lr=3e-3)
    q_heads, q_hp = quantize_medusa(heads, hp, "dynamic")

    ecfg = EngineConfig(max_batch_size=2, max_seq_len=96, prefill_chunk=16,
                        max_new_tokens=24, temperature=0.0)
    # Prompts from the training distribution, so acceptance is meaningful.
    rng = np.random.default_rng(11)
    prompts = [[int(t) for t in rng.integers(1, CFG.vocab_size, 8)]
               for _ in range(2)]
    plain = Engine(model, params, ecfg, kv_dtype=jnp.float32)
    plain_rids = [plain.add_request(p, 24) for p in prompts]
    plain_outs = plain.run()

    eng = Engine(model, params, ecfg, kv_dtype=jnp.float32,
                 medusa_heads=q_heads, medusa_params=q_hp,
                 gamma=2, lookup_branches=3)
    rids = [eng.add_request(p, 24) for p in prompts]
    outs = eng.run()
    for ra, rb in zip(plain_rids, rids):
        assert plain_outs[ra] == outs[rb], (plain_outs[ra], outs[rb])
    assert eng.metrics()["spec_acceptance_rate"] > 0.05


# -- Hydra (sequential) drafting heads ----------------------------------------


def test_hydra_shapes_and_training(model_and_params):
    from protoquant_tpu.models.medusa import init_hydra

    model, params = model_and_params
    heads, hp = init_hydra(model, depth=2, rng=jax.random.PRNGKey(6),
                           dtype=jnp.float32)
    corpus = _self_distill_corpus(model, params)
    hp2, losses = train_medusa_heads(model, params, heads, hp,
                                     [corpus] * 30, lr=3e-3)
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])

    # propose: distinct first tokens per branch; shape [B, J, depth].
    emb = params["params"]["embed_tokens"]["embedding"]
    h = jnp.asarray(
        np.random.default_rng(0).standard_normal((3, CFG.hidden_size)),
        jnp.float32)
    roots = jnp.asarray([1, 2, 3], jnp.int32)
    props = heads.apply(hp2, h, roots, emb, 4,
                        method=heads.propose)
    assert props.shape == (3, 4, 2)
    for b in range(3):
        firsts = [int(t) for t in props[b, :, 0]]
        assert len(set(firsts)) == 4


@pytest.mark.parametrize("kv_dtype", [jnp.float32, jnp.int8])
def test_hydra_engine_matches_plain_greedy(model_and_params, kv_dtype):
    from protoquant_tpu.models.medusa import init_hydra

    model, params = model_and_params
    heads, hp = init_hydra(model, depth=3, rng=jax.random.PRNGKey(7))
    ecfg = EngineConfig(max_batch_size=3, max_seq_len=96, prefill_chunk=16,
                        max_new_tokens=24, temperature=0.0)
    prompts = [[5, 6, 7, 5, 6, 7, 5, 6], [1, 2, 1, 2, 1, 2, 1],
               [9, 2, 9, 2, 9], [3, 3, 3, 3]]
    plain = Engine(model, params, ecfg, kv_dtype=kv_dtype)
    plain_rids = [plain.add_request(p, 24) for p in prompts]
    plain_outs = plain.run()
    eng = Engine(model, params, ecfg, kv_dtype=kv_dtype,
                 medusa_heads=heads, medusa_params=hp,
                 gamma=3, lookup_branches=3)
    rids = [eng.add_request(p, 24) for p in prompts]
    outs = eng.run()
    for ra, rb in zip(plain_rids, rids):
        assert plain_outs[ra] == outs[rb], (plain_outs[ra], outs[rb])


def test_hydra_trained_raises_acceptance_and_quantizes(model_and_params):
    """Trained sequential heads out-accept untrained; quantize_medusa
    applies unchanged (same QLinear construction) and keeps exactness."""
    from protoquant_tpu.models.medusa import init_hydra, quantize_medusa

    model, params = model_and_params
    corpus = _self_distill_corpus(model, params)
    heads, hp0 = init_hydra(model, depth=2, rng=jax.random.PRNGKey(9),
                            dtype=jnp.float32)
    hp1, _ = train_medusa_heads(model, params, heads, hp0, [corpus] * 60,
                                lr=3e-3)

    def run(heads_, hp_):
        ecfg = EngineConfig(max_batch_size=2, max_seq_len=96,
                            prefill_chunk=16, max_new_tokens=32,
                            temperature=0.0)
        eng = Engine(model, params, ecfg, kv_dtype=jnp.float32,
                     medusa_heads=heads_, medusa_params=hp_,
                     gamma=2, lookup_branches=3)
        rng = np.random.default_rng(11)
        for _ in range(2):
            eng.add_request(
                [int(t) for t in rng.integers(1, CFG.vocab_size, 8)], 32)
        eng.run()
        return eng.metrics()["spec_acceptance_rate"]

    untrained, trained = run(heads, hp0), run(heads, hp1)
    assert trained > untrained, (trained, untrained)
    assert trained > 0.1, trained

    q_heads, q_hp = quantize_medusa(heads, hp1, "dynamic")
    ecfg = EngineConfig(max_batch_size=1, max_seq_len=96, prefill_chunk=16,
                        max_new_tokens=16, temperature=0.0)
    plain = Engine(model, params, ecfg, kv_dtype=jnp.float32)
    pr = plain.add_request([5, 9, 2, 7], 16)
    ref = plain.run()[pr]
    eng = Engine(model, params, ecfg, kv_dtype=jnp.float32,
                 medusa_heads=q_heads, medusa_params=q_hp,
                 gamma=2, lookup_branches=3)
    rid = eng.add_request([5, 9, 2, 7], 16)
    assert eng.run()[rid] == ref


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 virtual devices")
def test_hydra_dp_tp_engine_matches_single_device(model_and_params):
    from protoquant_tpu.models.medusa import init_hydra

    jax.clear_caches()
    from protoquant_tpu.parallel import make_mesh, shard_params, tp_model
    from protoquant_tpu.utils.config import MeshConfig

    model, params = model_and_params
    heads, hp = init_hydra(model, depth=3, rng=jax.random.PRNGKey(10))
    ecfg = EngineConfig(max_batch_size=4, max_seq_len=96, prefill_chunk=16,
                        max_new_tokens=16, temperature=0.0)
    prompts = [[5, 6, 7, 5, 6, 7, 5, 6], [1, 2, 1, 2, 1, 2, 1],
               [9, 2, 9, 2, 9], [3, 3, 3, 3]]
    plain = Engine(model, params, ecfg, kv_dtype=jnp.float32)
    plain_rids = [plain.add_request(p, 16) for p in prompts]
    plain_outs = plain.run()
    mesh = make_mesh(MeshConfig(dp=2, tp=2), jax.devices()[:4])
    model_tp = tp_model(CFG, "fp", mesh, dtype=jnp.float32)
    sparams = shard_params(params, mesh)
    with mesh:
        eng = Engine(model_tp, sparams, ecfg, kv_dtype=jnp.float32,
                     mesh=mesh, medusa_heads=heads, medusa_params=hp,
                     gamma=3, lookup_branches=3)
        rids = [eng.add_request(p, 16) for p in prompts]
        outs = eng.run()
    for ra, rb in zip(plain_rids, rids):
        assert plain_outs[ra] == outs[rb], (plain_outs[ra], outs[rb])


def test_tree_mode_rejects_oversize_tree_on_int4_kv(model_and_params):
    """Constructor-time guard (round-4 KIVI lift): small trees live in the
    int4 cache's int8 tail and ARE supported
    (tests/test_tree_speculation.py::test_tree_speculation_int4_kv_exact);
    a tree wider than one KIVI chunk would recycle live tail rows and must
    refuse clearly (not corrupt mid-jit)."""
    from protoquant_tpu.models.kv_cache import INT4_KV_GROUP

    model, params = model_and_params
    depth = 8
    heads, hp = init_medusa(model, depth=depth)
    branches = INT4_KV_GROUP // depth + 1  # width 1 + J*d > chunk
    with pytest.raises(ValueError, match="KIVI"):
        Engine(model, params,
               EngineConfig(max_batch_size=2, max_seq_len=256),
               kv_dtype=jnp.int4, medusa_heads=heads, medusa_params=hp,
               gamma=depth, lookup_branches=branches)
