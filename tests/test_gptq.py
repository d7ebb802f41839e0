"""GPTQ error-compensated rounding (nn/gptq.py).

Gates: (1) with an identity Hessian GPTQ degenerates to exactly the RTN
contract (no cross terms -> no compensation); (2) on correlated calibration
inputs it strictly lowers the output-error proxy tr((W-Q)^T H (W-Q)) for
int8 and int4; (3) end-to-end int4 logits move closer to fp than plain
rounding; (4) the produced containers run through the unchanged QLinear
runtime paths.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protoquant_tpu.core import QTensor
from protoquant_tpu.models import LlamaModel
from protoquant_tpu.nn import quantize_params
from protoquant_tpu.nn.gptq import (
    _gptq_int4,
    _gptq_int8,
    collect_grams,
    gptq_params,
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


def _correlated_gram(k, n_samples=4096, seed=0):
    """Gram of strongly correlated inputs (low-rank mixing + noise) — the
    regime where error compensation matters."""
    rng = np.random.default_rng(seed)
    mix = rng.normal(size=(k, k // 4)).astype(np.float32)
    z = rng.normal(size=(n_samples, k // 4)).astype(np.float32)
    x = z @ mix.T + 0.1 * rng.normal(size=(n_samples, k)).astype(np.float32)
    return (x.T @ x).astype(np.float32), x


def _proxy_loss(W, Q, H):
    d = (W - Q).astype(np.float64)
    return float(np.trace(d.T @ H @ d))


def test_gptq_identity_hessian_equals_rtn():
    rng = np.random.default_rng(1)
    W = rng.normal(size=(96, 32)).astype(np.float32)
    qt = _gptq_int8(W.copy(), np.eye(96, dtype=np.float32))
    ref = QTensor.quantize(jnp.asarray(W), axis=0)
    np.testing.assert_array_equal(np.asarray(qt.data), np.asarray(ref.data))
    np.testing.assert_allclose(np.asarray(qt.scale), np.asarray(ref.scale), rtol=1e-6)


def test_gptq_int8_lowers_proxy_loss():
    rng = np.random.default_rng(2)
    K, N = 128, 64
    W = rng.normal(size=(K, N)).astype(np.float32)
    H, _ = _correlated_gram(K)
    qt = _gptq_int8(W.copy(), H)
    rtn = QTensor.quantize(jnp.asarray(W), axis=0)
    loss_gptq = _proxy_loss(W, np.asarray(qt.dequantize()), H)
    loss_rtn = _proxy_loss(W, np.asarray(rtn.dequantize()), H)
    assert loss_gptq < loss_rtn, (loss_gptq, loss_rtn)


def test_gptq_int4_lowers_proxy_loss_substantially():
    from protoquant_tpu.core.qtensor import QTensor4

    rng = np.random.default_rng(3)
    K, N = 128, 64
    W = rng.normal(size=(K, N)).astype(np.float32)
    H, _ = _correlated_gram(K, seed=5)
    qt = _gptq_int4(W.copy(), H, group=64, storage="packed")
    rtn = QTensor4.quantize(jnp.asarray(W), group=64)
    loss_gptq = _proxy_loss(W, np.asarray(qt.dequantize()), H)
    loss_rtn = _proxy_loss(W, np.asarray(rtn.dequantize()), H)
    # int4's coarse steps leave lots of recoverable correlated error.
    assert loss_gptq < 0.75 * loss_rtn, (loss_gptq, loss_rtn)


@pytest.fixture(scope="module")
def fp_model_and_calib():
    model = LlamaModel(CFG, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    rng = np.random.default_rng(7)
    # Enough calibration tokens that the Gram is well-conditioned for the
    # widest linear (down_proj K=128): rank-deficient H lets GPTQ push error
    # into the calibration null space, which is NOT null for fresh inputs.
    calib = jnp.asarray(rng.integers(1, CFG.vocab_size, (16, 48)), jnp.int32)
    return model, params, calib


def test_collect_grams_shapes(fp_model_and_calib):
    model, params, calib = fp_model_and_calib
    grams = collect_grams(model, params, calib)
    assert "layers_0/self_attn/q_proj" in grams
    assert "layers_1/mlp/down_proj" in grams
    assert "lm_head" in grams
    H = grams["layers_0/self_attn/q_proj"]
    assert H.shape == (CFG.hidden_size, CFG.hidden_size)
    np.testing.assert_allclose(H, H.T, atol=1e-2)  # Gram is symmetric
    assert np.all(np.diag(H) >= 0)
    # Down_proj sees the intermediate width.
    assert grams["layers_0/mlp/down_proj"].shape == (128, 128)
    # CALIB_MODE is off again: a plain apply sows nothing.
    from protoquant_tpu.nn import qlinear as _ql

    assert _ql.CALIB_MODE is False


def test_gptq_int4_model_end_to_end(fp_model_and_calib):
    """int4 via GPTQ runs through the unchanged QLinear runtime and lands
    closer to the fp logits than plain int4 rounding."""
    model, params, calib = fp_model_and_calib
    rng = np.random.default_rng(9)
    toks = jnp.asarray(rng.integers(1, CFG.vocab_size, (2, 16)), jnp.int32)
    ref = np.asarray(model.apply(params, toks))

    cfg4 = QuantConfig(mode="weight_only_int4", int4_group=32)
    grams = collect_grams(model, params, calib)
    q_gptq = gptq_params(params, grams, cfg4)
    q_rtn = quantize_params(params, cfg4)
    qmodel = LlamaModel(CFG, mode="weight_only_int4", int4_group=32,
                        dtype=jnp.float32)
    mse_gptq = np.mean((np.asarray(qmodel.apply(q_gptq, toks)) - ref) ** 2)
    mse_rtn = np.mean((np.asarray(qmodel.apply(q_rtn, toks)) - ref) ** 2)
    assert mse_gptq < mse_rtn, (mse_gptq, mse_rtn)


def test_gptq_int8_model_end_to_end(fp_model_and_calib):
    model, params, calib = fp_model_and_calib
    rng = np.random.default_rng(10)
    toks = jnp.asarray(rng.integers(1, CFG.vocab_size, (2, 16)), jnp.int32)
    ref = np.asarray(model.apply(params, toks))

    grams = collect_grams(model, params, calib)
    cfg8 = QuantConfig(mode="weight_only")
    q_gptq = gptq_params(params, grams, cfg8)
    q_rtn = quantize_params(params, cfg8)
    qmodel = LlamaModel(CFG, mode="weight_only", dtype=jnp.float32)
    mse_gptq = np.mean((np.asarray(qmodel.apply(q_gptq, toks)) - ref) ** 2)
    mse_rtn = np.mean((np.asarray(qmodel.apply(q_rtn, toks)) - ref) ** 2)
    assert mse_gptq < mse_rtn, (mse_gptq, mse_rtn)


def test_gptq_falls_back_without_gram(fp_model_and_calib):
    """Linears with no collected Gram quantize via the plain path."""
    model, params, calib = fp_model_and_calib
    grams = collect_grams(model, params, calib)
    grams.pop("layers_0/self_attn/q_proj")
    qp = gptq_params(params, grams, QuantConfig(mode="weight_only"))
    plain = quantize_params(params, QuantConfig(mode="weight_only"))
    a = qp["params"]["layers_0"]["self_attn"]["q_proj"]["qkernel"]
    b = plain["params"]["layers_0"]["self_attn"]["q_proj"]["qkernel"]
    np.testing.assert_array_equal(np.asarray(a.data), np.asarray(b.data))


def test_gptq_moe_stacked_falls_back():
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, num_local_experts=2,
    )
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 4), jnp.int32))
    calib = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32)
    grams = collect_grams(model, params, calib)
    qp = gptq_params(params, grams, QuantConfig(mode="weight_only"))
    w1 = qp["params"]["layers_0"]["block_sparse_moe"]["w1"]["qkernel"]
    assert isinstance(w1, QTensor) and w1.data.ndim == 3  # plain stacked int8
