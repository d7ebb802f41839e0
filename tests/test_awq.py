"""AWQ activation-aware scale search (nn/awq.py).

Gates: (1) the fold is an fp identity; (2) on an outlier model it improves
quantized logit fidelity for the config it was searched against (int4 —
AWQ's home turf — and dynamic int8); (3) the grid search picks a nonzero
exponent where outliers exist and never loses to alpha=0 on the calibration
set; (4) it composes with sandwich norms (Gemma-2/3 pre_feedforward fold)
and Gemma's (1+w) norms; (5) input params are untouched.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protoquant_tpu.models import LlamaModel
from protoquant_tpu.nn import quantize_params
from protoquant_tpu.nn.awq import (
    awq_params,
    awq_quantize,
    collect_norm_outputs,
    search_scale,
)
from protoquant_tpu.utils.config import ModelConfig, QuantConfig

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


def _outlier_params(cfg, seed=0, boost=40.0, n_outlier=4):
    """Inject activation outliers via boosted norm channels (the regime both
    SmoothQuant and AWQ target)."""
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 4), jnp.int32))
    root = params["params"]
    for lname, layer in root.items():
        if not lname.startswith("layers_"):
            continue
        for norm in ("input_layernorm", "post_attention_layernorm",
                     "pre_feedforward_layernorm"):
            if norm not in layer:
                continue
            w = layer[norm]["weight"]
            layer[norm]["weight"] = w.at[:n_outlier].mul(boost)
    return model, params


@pytest.fixture(scope="module")
def calib_tokens():
    rng = np.random.default_rng(7)
    return jnp.asarray(rng.integers(1, CFG.vocab_size, (2, 16)), jnp.int32)


def _logit_mse(model_q, qparams, ref_logits, tokens):
    out = model_q.apply(qparams, tokens).astype(jnp.float32)
    return float(jnp.mean((out - ref_logits.astype(jnp.float32)) ** 2))


def test_awq_is_fp_identity(calib_tokens):
    model, params = _outlier_params(CFG)
    ref = model.apply(params, calib_tokens)
    scaled = awq_quantize(model, params, calib_tokens, QuantConfig())
    out = model.apply(scaled, calib_tokens)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-4, atol=2e-4,
    )


@pytest.mark.parametrize("mode", ["dynamic", "weight_only_int4"])
def test_awq_improves_quantized_fidelity(calib_tokens, mode):
    model, params = _outlier_params(CFG)
    ref = model.apply(params, calib_tokens)
    qcfg = QuantConfig(mode=mode, int4_group=32)
    kwargs = dict(int4_group=32) if mode == "weight_only_int4" else {}
    model_q = LlamaModel(CFG, mode=mode, dtype=jnp.float32, **kwargs)

    base = _logit_mse(model_q, quantize_params(params, qcfg), ref, calib_tokens)
    scaled = awq_quantize(model, params, calib_tokens, qcfg)
    tuned = _logit_mse(model_q, quantize_params(scaled, qcfg), ref, calib_tokens)
    assert tuned < base, (tuned, base)


def test_awq_search_prefers_migration_on_outliers():
    rng = np.random.default_rng(3)
    K, N, S = 64, 32, 256
    X = rng.standard_normal((S, K)).astype(np.float32)
    X[:, :3] *= 50.0  # activation outlier channels
    W = (rng.standard_normal((K, N)) * 0.05).astype(np.float32)
    s, alpha = search_scale(X, [W], QuantConfig(mode="weight_only_int4",
                                                int4_group=32))
    assert alpha > 0.0
    assert s[:3].mean() > s[3:].mean()  # outlier channels shrunk harder


def test_awq_never_worse_than_identity_on_calib():
    rng = np.random.default_rng(5)
    K, N, S = 32, 16, 128
    X = rng.standard_normal((S, K)).astype(np.float32)
    W = rng.standard_normal((K, N)).astype(np.float32)
    from protoquant_tpu.nn.awq import _group_loss

    cfg = QuantConfig()
    s, _ = search_scale(X, [W], cfg)
    ident = np.ones(K, np.float32)
    assert _group_loss(X, [W], s, cfg) <= _group_loss(X, [W], ident, cfg) + 1e-6


def test_awq_sandwich_norm_identity(calib_tokens):
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, sandwich_norms=True,
        rmsnorm_unit_offset=True, hidden_act="gelu_tanh",
    )
    model, params = _outlier_params(cfg, boost=20.0)
    ref = model.apply(params, calib_tokens)
    scaled = awq_quantize(model, params, calib_tokens, QuantConfig())
    # pre_feedforward (not post_attention) must carry the MLP fold.
    l0 = params["params"]["layers_0"]
    s0 = scaled["params"]["layers_0"]
    assert not np.allclose(
        np.asarray(l0["pre_feedforward_layernorm"]["weight"]),
        np.asarray(s0["pre_feedforward_layernorm"]["weight"]),
    )
    np.testing.assert_allclose(
        np.asarray(l0["post_attention_layernorm"]["weight"]),
        np.asarray(s0["post_attention_layernorm"]["weight"]),
    )
    out = model.apply(scaled, calib_tokens)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-4, atol=2e-4,
    )


def test_smooth_sandwich_norm_identity(calib_tokens):
    """Regression for the sandwich-norm fold bug: SmoothQuant must fold the
    MLP scales into pre_feedforward_layernorm on Gemma-2/3-shaped models."""
    from protoquant_tpu.nn import smoothquant

    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, sandwich_norms=True,
        rmsnorm_unit_offset=True, hidden_act="gelu_tanh",
    )
    model, params = _outlier_params(cfg, boost=20.0)
    ref = model.apply(params, calib_tokens)
    scaled = smoothquant(model, params, calib_tokens)
    out = model.apply(scaled, calib_tokens)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-4, atol=2e-4,
    )


def test_calibration_post_norm_is_noop(calib_tokens):
    """Regression for the post-norm fold bug (ADVICE r2, high): on OLMo-2
    shaped models post_attention_layernorm normalizes the attention OUTPUT
    and the MLP reads the raw residual — there is no foldable producer, so
    smoothquant/awq_quantize must leave the params untouched (previously
    they folded MLP scales into post_attention_layernorm, silently corrupting
    the model: fp logits diverged by max-abs ~2.75)."""
    from protoquant_tpu.nn import smoothquant

    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, post_norm=True, qk_norm=True,
        qk_norm_full=True,
    )
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    ref = model.apply(params, calib_tokens)
    for fn in (
        lambda: smoothquant(model, params, calib_tokens),
        lambda: awq_quantize(model, params, calib_tokens, QuantConfig()),
    ):
        scaled = fn()
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(scaled)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        out = model.apply(scaled, calib_tokens)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_awq_input_unchanged(calib_tokens):
    model, params = _outlier_params(CFG)
    before = jax.tree_util.tree_map(lambda a: np.asarray(a).copy(), params)
    awq_quantize(model, params, calib_tokens, QuantConfig())
    after = jax.tree_util.tree_map(np.asarray, params)
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, b)


def test_awq_moe_identity(calib_tokens):
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, num_local_experts=4,
        num_experts_per_tok=2,
    )
    model, params = _outlier_params(cfg, boost=20.0)
    ref = model.apply(params, calib_tokens)
    outs = collect_norm_outputs(model, params, calib_tokens)
    scaled, alphas = awq_params(params, outs, QuantConfig())
    assert any(g == "moe" for (_, g) in alphas)
    out = model.apply(scaled, calib_tokens)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-4, atol=2e-4,
    )


def test_awq_rejects_quantized_model(calib_tokens):
    model, params = _outlier_params(CFG)
    model_q = LlamaModel(CFG, mode="dynamic", dtype=jnp.float32)
    with pytest.raises(ValueError):
        collect_norm_outputs(model_q, params, calib_tokens)
