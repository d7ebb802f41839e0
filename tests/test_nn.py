"""M2: QLinear module + quantize_params conversion."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protoquant_tpu.core import QTensor, numerics
from protoquant_tpu.nn import QLinear, dequantize_params, quantize_params, quantized_bytes
from protoquant_tpu.utils.config import QuantConfig


def rand(shape, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray((rng.standard_normal(shape) * scale).astype(np.float32))


@pytest.mark.parametrize("mode", ["fp", "dynamic", "weight_only"])
def test_qlinear_init_and_forward(mode):
    x = rand((4, 64), seed=1)
    layer = QLinear(features=32, mode=mode, dtype=jnp.float32)
    params = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(params, x)
    assert y.shape == (4, 32)
    assert np.all(np.isfinite(np.asarray(y, np.float32)))


def test_qlinear_conversion_matches_reference():
    """fp params -> quantize_params -> dynamic QLinear == numerics reference."""
    x = rand((8, 128), seed=2, scale=0.5)
    fp_layer = QLinear(features=64, mode="fp", dtype=jnp.float32)
    fp_params = fp_layer.init(jax.random.PRNGKey(1), x)

    qparams = quantize_params(fp_params)
    q_layer = QLinear(features=64, mode="dynamic", dtype=jnp.float32)
    y_q = q_layer.apply(qparams, x)

    w = fp_params["params"]["kernel"]
    b = fp_params["params"]["bias"]
    wq, s_w = numerics.quantize_channelwise(w, axis=0)
    y_ref = numerics.dynamic_qlinear_ref(x, wq, s_w, b)
    np.testing.assert_allclose(
        np.asarray(y_q), np.asarray(y_ref), rtol=1e-5, atol=1e-5
    )


def test_qlinear_dynamic_close_to_fp():
    x = rand((16, 256), seed=3, scale=0.5)
    fp_layer = QLinear(features=128, mode="fp", dtype=jnp.float32)
    fp_params = fp_layer.init(jax.random.PRNGKey(2), x)
    y_fp = np.asarray(fp_layer.apply(fp_params, x))

    for mode in ("dynamic", "weight_only"):
        q_layer = QLinear(features=128, mode=mode, dtype=jnp.float32)
        y_q = np.asarray(q_layer.apply(quantize_params(fp_params), x))
        cos = np.sum(y_fp * y_q) / (
            np.linalg.norm(y_fp) * np.linalg.norm(y_q) + 1e-12
        )
        assert cos > 0.999, f"{mode}: cosine {cos}"


def test_quantize_params_skip_patterns():
    fp_layer = QLinear(features=16, mode="fp", dtype=jnp.float32)
    fp_params = fp_layer.init(jax.random.PRNGKey(3), rand((2, 8)))
    cfg = QuantConfig(skip_patterns=("params",))
    out = quantize_params(fp_params, cfg)
    assert "kernel" in out["params"]  # untouched


def test_dequantize_params_roundtrip_structure():
    fp_layer = QLinear(features=16, mode="fp", dtype=jnp.float32)
    fp_params = fp_layer.init(jax.random.PRNGKey(4), rand((2, 8)))
    q = quantize_params(fp_params)
    assert isinstance(q["params"]["qkernel"], QTensor)
    back = dequantize_params(q)
    assert "kernel" in back["params"]
    assert back["params"]["kernel"].shape == fp_params["params"]["kernel"].shape


def test_quantized_bytes_shrinks():
    fp_layer = QLinear(features=256, mode="fp", dtype=jnp.float32, use_bias=False)
    fp_params = fp_layer.init(jax.random.PRNGKey(5), rand((2, 256)))
    fp_bytes = quantized_bytes(fp_params)
    q_bytes = quantized_bytes(quantize_params(fp_params))
    assert q_bytes < fp_bytes / 3.5  # ~4x shrink minus scale overhead
