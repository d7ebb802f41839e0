"""INT4 group-wise weight-only mode (capability extension beyond the
reference's int8 scheme)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protoquant_tpu.core import QTensor4, numerics
from protoquant_tpu.nn import QLinear, dequantize_params, quantize_params
from protoquant_tpu.ops import weight_only_int4_matmul
from protoquant_tpu.utils.config import QuantConfig

# Subsystem matrix: full-coverage tier (fast tier: -m 'not slow').
pytestmark = pytest.mark.slow


def rand(shape, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray((rng.standard_normal(shape) * scale).astype(np.float32))


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(-7, 8, (256, 96), dtype=np.int8))
    for group in (None, 128, 64):
        packed = numerics.pack_int4(q, group)
        assert packed.shape == (128, 96)
        back = numerics.unpack_int4(packed, group)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(q))


def _group_dequant(q, s, group=128):
    g, n = np.asarray(s).shape
    return (
        np.asarray(q, np.float32).reshape(g, group, n) * np.asarray(s)[:, None, :]
    ).reshape(g * group, n)


def test_groupwise_quantize_error_bound():
    """clip='amax' never clips: every element lands within half a step."""
    w = rand((256, 64), seed=1, scale=2.0)
    q, s = numerics.quantize_groupwise_int4(w, group=128, clip="amax")
    assert q.shape == w.shape and s.shape == (2, 64)
    w_hat = _group_dequant(q, s)
    bound = np.repeat(np.asarray(s), 128, axis=0) / 2 + 1e-8
    assert np.all(np.abs(w_hat - np.asarray(w)) <= bound)


def test_groupwise_mse_clip_improves_reconstruction():
    """The default clip='mse' scale search must beat amax scaling in total
    reconstruction MSE (it trades bounded clipping for narrower steps)."""
    w = rand((256, 64), seed=3, scale=1.0)
    qa, sa = numerics.quantize_groupwise_int4(w, group=128, clip="amax")
    qm, sm = numerics.quantize_groupwise_int4(w, group=128)  # default mse
    err_a = np.mean((_group_dequant(qa, sa) - np.asarray(w)) ** 2)
    err_m = np.mean((_group_dequant(qm, sm) - np.asarray(w)) ** 2)
    assert err_m < err_a, (err_m, err_a)
    # Values stay in the nibble range either way.
    assert np.abs(np.asarray(qm)).max() <= 7


def test_qtensor4_roundtrip_and_bytes():
    w = rand((256, 128), seed=2, scale=0.1)
    qt = QTensor4.quantize(w, group=128)
    assert qt.shape == (256, 128)
    assert qt.nbytes() < w.size * 4 / 7  # ~8x smaller than f32
    w_hat = np.asarray(qt.dequantize())
    cos = np.sum(w_hat * np.asarray(w)) / (
        np.linalg.norm(w_hat) * np.linalg.norm(np.asarray(w)) + 1e-12
    )
    # 4-bit symmetric (qmax=7) on gaussian weights: SNR ~ 65 -> cos ~ 0.992
    assert cos > 0.985


@pytest.mark.parametrize("m,k,n,group", [(16, 256, 128, 128), (5, 128, 96, 64)])
def test_wo4_kernel_matches_reference(m, k, n, group):
    x = rand((m, k), seed=3, scale=0.5)
    w = rand((k, n), seed=4, scale=0.05)
    b = rand((n,), seed=5)
    q, s = numerics.quantize_groupwise_int4(w, group=group)
    packed = numerics.pack_int4(q, group)
    y = weight_only_int4_matmul(x, packed, s, group=group, bias=b)
    y_ref = numerics.weight_only_int4_linear_ref(x, packed, s, group, bias=b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-3, atol=2e-3)


def test_qlinear_int4_mode():
    x = rand((8, 256), seed=6, scale=0.5)
    fp = QLinear(features=64, mode="fp", dtype=jnp.float32)
    fp_params = fp.init(jax.random.PRNGKey(0), x)
    y_fp = np.asarray(fp.apply(fp_params, x))

    qparams = quantize_params(fp_params, QuantConfig(mode="weight_only_int4"))
    assert isinstance(qparams["params"]["qkernel"], QTensor4)
    q = QLinear(features=64, mode="weight_only_int4", dtype=jnp.float32)
    y_q = np.asarray(q.apply(qparams, x))
    cos = np.sum(y_fp * y_q) / (np.linalg.norm(y_fp) * np.linalg.norm(y_q) + 1e-12)
    assert cos > 0.995, cos

    back = dequantize_params(qparams)
    assert back["params"]["kernel"].shape == (256, 64)


def test_int4_model_end_to_end():
    from protoquant_tpu.models import LlamaModel
    from protoquant_tpu.utils.config import ModelConfig

    cfg = ModelConfig(
        vocab_size=64, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64,
    )
    fp_model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    tokens = jnp.asarray(
        np.random.default_rng(7).integers(0, 64, (1, 12)), jnp.int32
    )
    fp_params = fp_model.init(jax.random.PRNGKey(1), tokens)
    logits_fp = np.asarray(fp_model.apply(fp_params, tokens))

    q_model = LlamaModel(cfg, mode="weight_only_int4", dtype=jnp.float32)
    qparams = quantize_params(fp_params, QuantConfig(mode="weight_only_int4"))
    logits_q = np.asarray(q_model.apply(qparams, tokens))
    cos = np.sum(logits_fp * logits_q) / (
        np.linalg.norm(logits_fp) * np.linalg.norm(logits_q) + 1e-12
    )
    # int4 error compounds over 2 layers + lm_head; ~0.94 is expected
    assert cos > 0.9, cos


def test_qtensor4_native_storage_roundtrip():
    """Native s4 storage: same quantized values as the byte-packed layout
    (dequantize matches exactly), half the logical payload bytes."""
    import numpy as np

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((256, 64)), jnp.float32)
    packed = QTensor4.quantize(w, group=128, storage="packed")
    native = QTensor4.quantize(w, group=128, storage="native")
    assert native.storage == "native" and packed.storage == "packed"
    assert native.data.dtype == jnp.int4 and native.data.shape == (256, 64)
    np.testing.assert_array_equal(
        np.asarray(packed.dequantize()), np.asarray(native.dequantize())
    )
    assert native.nbytes() == packed.nbytes()


def test_int4_native_xla_matmul_matches_packed():
    """The grouped native-s4 XLA matmul == the packed unpack-and-matmul, for
    both the small-M grouped-einsum form and the large-M materialized form."""
    import numpy as np

    from protoquant_tpu.ops import (
        weight_only_int4_matmul_xla,
    )

    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((256, 64)), jnp.float32)
    packed = QTensor4.quantize(w, group=128, storage="packed")
    native = QTensor4.quantize(w, group=128, storage="native")
    for m in (4, 128):  # grouped-einsum branch and materialized branch
        x = jnp.asarray(rng.standard_normal((m, 256)), jnp.float32)
        ref = np.asarray(x) @ np.asarray(packed.dequantize())
        y_packed = np.asarray(
            weight_only_int4_matmul_xla(
                x, packed.data, packed.scale, 128, out_dtype=jnp.float32
            )
        )
        y_native = np.asarray(
            weight_only_int4_matmul_xla(
                x, native.data, native.scale, 128, out_dtype=jnp.float32
            )
        )
        scale = np.abs(ref).max()
        if m <= 64:
            # Grouped-einsum branch: f32 lanes on CPU -> tight vs f32 ref.
            np.testing.assert_allclose(y_native, ref, rtol=1e-4, atol=1e-4)
        else:
            # Materialized branch (both storages): bf16-lane rounding.
            np.testing.assert_allclose(
                y_native / scale, ref / scale, rtol=0, atol=6e-3
            )
        np.testing.assert_allclose(
            y_packed / scale, ref / scale, rtol=0, atol=6e-3
        )


def test_int4_native_model_end_to_end():
    """QuantConfig(int4_storage='native') converts and the model runs; the
    QLinear dispatches native payloads to the XLA formulation regardless of
    the global backend knob."""
    import numpy as np

    from protoquant_tpu import ops as _ops
    from protoquant_tpu.models import LlamaModel
    from protoquant_tpu.nn import quantize_params
    from protoquant_tpu.utils.config import ModelConfig, QuantConfig

    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64,
    )
    toks = jnp.asarray(
        np.random.default_rng(2).integers(0, 64, (1, 8)), jnp.int32
    )
    fp = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    p = fp.init(jax.random.PRNGKey(0), toks)
    ref = np.asarray(fp.apply(p, toks))
    qp = quantize_params(
        p, QuantConfig(mode="weight_only_int4", int4_group=32,
                       int4_storage="native")
    )
    model = LlamaModel(cfg, mode="weight_only_int4", dtype=jnp.float32,
                       int4_group=32, int4_storage="native")
    old = _ops.LINEAR_BACKEND
    try:
        _ops.LINEAR_BACKEND = "pallas"  # native payload must still route xla
        got = np.asarray(model.apply(qp, toks))
    finally:
        _ops.LINEAR_BACKEND = old
    cos = float((ref * got).sum() / (np.linalg.norm(ref) * np.linalg.norm(got)))
    assert cos > 0.95, cos  # group=32 int4 on a tiny random model
