"""SmoothQuant activation-outlier migration (nn/smooth.py).

Gates: (1) the transform is an fp identity (folding s into the norm and
weights changes nothing mathematically); (2) on a model with activation
outliers it measurably improves dynamic-int8 logit fidelity; (3) it composes
with Gemma's (1+w) norm and with MoE layers.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protoquant_tpu.models import LlamaModel
from protoquant_tpu.nn import quantize_params
from protoquant_tpu.nn.smooth import (
    collect_activation_stats,
    smooth_params,
    smoothquant,
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


def _outlier_params(cfg, seed=0, boost=40.0, n_outlier=4):
    """fp params with injected activation outliers: a few input_layernorm /
    post_attention_layernorm channels are scaled way up, so every norm
    output has dominant channels — the regime SmoothQuant targets."""
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 4), jnp.int32))
    root = params["params"]
    for lname, layer in root.items():
        if not lname.startswith("layers_"):
            continue
        for norm in ("input_layernorm", "post_attention_layernorm"):
            w = layer[norm]["weight"]
            w = w.at[:n_outlier].mul(boost)
            layer[norm]["weight"] = w
    return model, params


@pytest.fixture(scope="module")
def calib_tokens():
    rng = np.random.default_rng(7)
    return jnp.asarray(rng.integers(1, CFG.vocab_size, (2, 16)), jnp.int32)


def test_smooth_is_fp_identity(calib_tokens):
    model, params = _outlier_params(CFG)
    ref = model.apply(params, calib_tokens)
    smoothed = smoothquant(model, params, calib_tokens, alpha=0.5)
    out = model.apply(smoothed, calib_tokens)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_smooth_improves_dynamic_int8(calib_tokens):
    """With outlier channels, dynamic-int8 logits from smoothed params must
    be closer to fp than from raw params."""
    model, params = _outlier_params(CFG)
    fp_logits = np.asarray(model.apply(params, calib_tokens))

    qmodel = LlamaModel(CFG, mode="dynamic", dtype=jnp.float32)

    def err(p):
        q = qmodel.apply(quantize_params(p), calib_tokens)
        return float(np.mean((np.asarray(q) - fp_logits) ** 2))

    raw_err = err(params)
    smooth_err = err(smoothquant(model, params, calib_tokens, alpha=0.5))
    assert smooth_err < raw_err, (smooth_err, raw_err)
    # The improvement should be substantial in the outlier regime.
    assert smooth_err < 0.7 * raw_err, (smooth_err, raw_err)


def test_smooth_input_unchanged(calib_tokens):
    model, params = _outlier_params(CFG)
    before = np.asarray(params["params"]["layers_0"]["self_attn"]["q_proj"]["kernel"])
    _ = smoothquant(model, params, calib_tokens)
    after = np.asarray(params["params"]["layers_0"]["self_attn"]["q_proj"]["kernel"])
    np.testing.assert_array_equal(before, after)


def test_smooth_gemma_unit_offset_identity(calib_tokens):
    cfg = ModelConfig(
        vocab_size=64,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        rmsnorm_unit_offset=True,
        scale_embeddings=True,
        hidden_act="gelu_tanh",
    )
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 4), jnp.int32))
    ref = model.apply(params, calib_tokens)
    smoothed = smoothquant(model, params, calib_tokens, alpha=0.5)
    out = model.apply(smoothed, calib_tokens)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_smooth_moe_identity(calib_tokens):
    cfg = ModelConfig(
        vocab_size=64,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        num_local_experts=4,
        num_experts_per_tok=2,
    )
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 4), jnp.int32))
    ref = model.apply(params, calib_tokens)
    smoothed = smoothquant(model, params, calib_tokens, alpha=0.5)
    out = model.apply(smoothed, calib_tokens)
    # Router logits shift by float roundoff; with near-tied routing weights a
    # top-k flip would change outputs macroscopically — tolerance catches it.
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=5e-4, atol=5e-4
    )


def test_smooth_rejects_quantized_model(calib_tokens):
    model, params = _outlier_params(CFG)
    qmodel = LlamaModel(CFG, mode="dynamic", dtype=jnp.float32)
    with pytest.raises(ValueError, match="fp"):
        collect_activation_stats(qmodel, quantize_params(params), calib_tokens)


def test_smooth_stats_shapes(calib_tokens):
    model, params = _outlier_params(CFG)
    stats = collect_activation_stats(model, params, calib_tokens)
    assert "layers_0" in stats and "layers_1" in stats
    for norm in ("input_layernorm", "post_attention_layernorm"):
        assert stats["layers_0"][norm].shape == (CFG.hidden_size,)
    # Partial stats apply cleanly (smooth_params skips absent layers).
    partial = {"layers_0": stats["layers_0"]}
    out = smooth_params(params, partial)
    q0 = np.asarray(out["params"]["layers_1"]["self_attn"]["q_proj"]["kernel"])
    np.testing.assert_array_equal(
        q0, np.asarray(params["params"]["layers_1"]["self_attn"]["q_proj"]["kernel"])
    )
