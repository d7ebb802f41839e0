"""XLA-fused linear backend == Pallas backend (to fp tolerance)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import protoquant_tpu.ops as ops
from protoquant_tpu.core import numerics
from protoquant_tpu.models import LlamaModel
from protoquant_tpu.nn import quantize_params
from protoquant_tpu.utils.config import ModelConfig, QuantConfig


def rand(shape, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray((rng.standard_normal(shape) * scale).astype(np.float32))


def test_dynamic_xla_matches_reference():
    x = rand((16, 256), seed=1, scale=0.5)
    w = rand((256, 128), seed=2, scale=0.05)
    b = rand((128,), seed=3)
    wq, s_w = numerics.quantize_channelwise(w, axis=0)
    y_xla = ops.dynamic_qlinear_xla(x, wq, s_w, b, out_dtype=jnp.float32)
    y_ref = numerics.dynamic_qlinear_ref(x, wq, s_w, b)
    # bf16-lane products are exact for int8 operands; only accumulation
    # order/rounding differs from the int32 path.
    np.testing.assert_allclose(np.asarray(y_xla), np.asarray(y_ref), rtol=2e-3, atol=2e-3)


def test_weight_only_xla_matches_reference():
    x = rand((8, 256), seed=4, scale=0.5)
    w = rand((256, 96), seed=5, scale=0.05)
    wq, s_w = numerics.quantize_channelwise(w, axis=0)
    y_xla = ops.weight_only_matmul_xla(x, wq, s_w, out_dtype=jnp.float32)
    y_ref = numerics.weight_only_linear_ref(x, wq, s_w)
    np.testing.assert_allclose(np.asarray(y_xla), np.asarray(y_ref), rtol=5e-3, atol=5e-3)


def test_int4_xla_matches_reference():
    x = rand((8, 256), seed=6, scale=0.5)
    w = rand((256, 96), seed=7, scale=0.05)
    q, s = numerics.quantize_groupwise_int4(w, group=128)
    packed = numerics.pack_int4(q, 128)
    y_xla = ops.weight_only_int4_matmul_xla(x, packed, s, 128, out_dtype=jnp.float32)
    y_ref = numerics.weight_only_int4_linear_ref(x, packed, s, 128)
    np.testing.assert_allclose(np.asarray(y_xla), np.asarray(y_ref), rtol=5e-3, atol=5e-3)


def test_auto_backend_routing():
    """Default is the measured-table "auto" policy: on this runtime every
    linear GEMM resolves to the XLA formulation (BASELINE.md formulation
    probe); explicit overrides pass through untouched."""
    assert ops.LINEAR_BACKEND == "auto"
    assert ops.resolve_linear_backend(1, 4096, 4096) == "xla"   # decode
    assert ops.resolve_linear_backend(512, 4096, 11008) == "xla"  # prefill
    assert ops.resolve_linear_backend() == "xla"  # shapeless call sites
    prev = ops.LINEAR_BACKEND
    try:
        ops.LINEAR_BACKEND = "pallas"
        assert ops.resolve_linear_backend(512, 4096, 4096) == "pallas"
        ops.LINEAR_BACKEND = "xla"
        assert ops.resolve_linear_backend(512, 4096, 4096) == "xla"
    finally:
        ops.LINEAR_BACKEND = prev


@pytest.mark.parametrize("mode", ["dynamic", "weight_only"])
def test_model_backends_agree(mode):
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=64,
    )
    fp_model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    tokens = jnp.asarray(np.random.default_rng(8).integers(0, 64, (1, 10)), jnp.int32)
    fp_params = fp_model.init(jax.random.PRNGKey(0), tokens)
    qparams = quantize_params(fp_params, QuantConfig(mode=mode if mode != "dynamic" else "dynamic"))
    q_model = LlamaModel(cfg, mode=mode, dtype=jnp.float32)

    prev = ops.LINEAR_BACKEND
    try:
        ops.LINEAR_BACKEND = "pallas"
        lp = np.asarray(q_model.apply(qparams, tokens))
        ops.LINEAR_BACKEND = "xla"
        lx = np.asarray(q_model.apply(qparams, tokens))
    finally:
        ops.LINEAR_BACKEND = prev
    np.testing.assert_allclose(lp, lx, rtol=5e-2, atol=5e-2)
    agree = np.mean(np.argmax(lp, -1) == np.argmax(lx, -1))
    assert agree > 0.9, agree
