"""fp8 (e4m3) weight storage mode + fp8 KV cache (QTensorF8, qlinear fp8).

e4m3 has 3 mantissa bits -> per-element relative error <= 2^-4 after
per-channel scaling into the representable range; unlike int8 there is no
rounding contract to pin (no oracle), so gates are error bounds and
end-to-end fidelity.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protoquant_tpu.core import QTensorF8
from protoquant_tpu.models import LlamaModel, init_cache
from protoquant_tpu.nn import dequantize_params, quantize_params
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


def test_qtensorf8_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(96, 48)) * 3.0, jnp.float32)
    qt = QTensorF8.quantize(w, axis=0)
    assert qt.data.dtype == jnp.float8_e4m3fn
    assert qt.scale.shape == (48,)
    back = qt.dequantize()
    rel = np.abs(np.asarray(back) - np.asarray(w)) / (np.abs(np.asarray(w)) + 1e-9)
    # e4m3: 2^-4 max relative step inside the normal range; the per-channel
    # scale can push small elements subnormal, so bound the 99.9th pct.
    assert np.quantile(rel, 0.999) < 0.07, np.quantile(rel, 0.999)
    assert qt.nbytes() == 96 * 48 + 48 * 4


def test_qtensorf8_outlier_headroom():
    """fp8's per-element exponent keeps small channels accurate even when a
    single outlier inflates the channel scale — int8's weakness."""
    w = np.ones((64, 4), np.float32) * 0.01
    w[0, :] = 100.0  # 10^4 dynamic range within each channel
    qt = QTensorF8.quantize(jnp.asarray(w), axis=0)
    back = np.asarray(qt.dequantize())
    small_rel = np.abs(back[1:] - 0.01) / 0.01
    assert small_rel.max() < 0.07, small_rel.max()  # int8 would give 100% err


def test_fp8_convert_and_dequantize_params():
    model = LlamaModel(CFG, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    qparams = quantize_params(params, QuantConfig(mode="weight_only_fp8"))
    leaf = qparams["params"]["layers_0"]["self_attn"]["q_proj"]["qkernel"]
    assert isinstance(leaf, QTensorF8)
    deq = dequantize_params(qparams)
    k = deq["params"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    ref = params["params"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert np.allclose(np.asarray(k), np.asarray(ref), rtol=0.08, atol=1e-4)


def test_fp8_model_logits_close_to_fp():
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(1, CFG.vocab_size, (2, 12)), jnp.int32)
    fp_model = LlamaModel(CFG, mode="fp", dtype=jnp.float32)
    params = fp_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    ref = np.asarray(fp_model.apply(params, tokens))

    qmodel = LlamaModel(CFG, mode="weight_only_fp8", dtype=jnp.float32)
    qparams = quantize_params(params, QuantConfig(mode="weight_only_fp8"))
    out = np.asarray(qmodel.apply(qparams, tokens))

    cos = np.sum(out * ref) / (np.linalg.norm(out) * np.linalg.norm(ref))
    # Random tiny-model logits are near-tied, amplifying relative error.
    # On Gaussian (outlier-free) weights int8's ~7 uniform bits beat e4m3's
    # 3 mantissa bits — fp8's advantage is outlier robustness, asserted in
    # test_fp8_beats_int8_on_outlier_weights below.
    assert cos > 0.995, cos


def test_fp8_beats_int8_on_outlier_weights():
    """With in-channel weight outliers, int8's single per-channel scale
    crushes the small elements while e4m3's per-element exponent keeps
    them: fp8 weight-only must reconstruct strictly better."""
    from protoquant_tpu.core import QTensor

    rng = np.random.default_rng(11)
    w = rng.normal(size=(128, 64)).astype(np.float32) * 0.02
    w[rng.integers(0, 128, 8), rng.integers(0, 64, 8)] = 12.0  # outliers
    wj = jnp.asarray(w)
    f8_err = np.mean((np.asarray(QTensorF8.quantize(wj, 0).dequantize()) - w) ** 2)
    i8_err = np.mean((np.asarray(QTensor.quantize(wj, 0).dequantize()) - w) ** 2)
    assert f8_err < 0.5 * i8_err, (f8_err, i8_err)


def test_fp8_kv_cache_decode():
    """fp8 KV storage through the dtype-generic dense cache: greedy decode
    stays close to the fp32-cache stream."""
    from protoquant_tpu.models import greedy_generate

    fp_model = LlamaModel(CFG, mode="fp", dtype=jnp.float32)
    params = fp_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    prompt = jnp.asarray([[3, 17, 5, 9, 11]], jnp.int32)
    ref = greedy_generate(
        fp_model, params, prompt, max_new_tokens=8, max_seq=64,
        kv_dtype=jnp.float32,
    )
    out = greedy_generate(
        fp_model, params, prompt, max_new_tokens=8, max_seq=64,
        kv_dtype=jnp.float8_e4m3fn,
    )
    # Random-weight logits are near-tied, so allow small divergence but
    # require agreement on a prefix.
    a, b = list(np.asarray(ref)[0]), list(np.asarray(out)[0])
    assert a[:2] == b[:2], (a, b)


def test_fp8_moe_convert():
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, num_local_experts=4,
    )
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 4), jnp.int32))
    qparams = quantize_params(params, QuantConfig(mode="weight_only_fp8"))
    w1 = qparams["params"]["layers_0"]["block_sparse_moe"]["w1"]["qkernel"]
    assert isinstance(w1, QTensorF8) and w1.data.dtype == jnp.float8_e4m3fn
    assert w1.scale.shape == (4, 128)  # per-expert per-output-channel

    rng = np.random.default_rng(5)
    tokens = jnp.asarray(rng.integers(1, 64, (1, 8)), jnp.int32)
    ref = np.asarray(model.apply(params, tokens))
    qmodel = LlamaModel(cfg, mode="weight_only_fp8", dtype=jnp.float32)
    out = np.asarray(qmodel.apply(qparams, tokens))
    cos = np.sum(out * ref) / (np.linalg.norm(out) * np.linalg.norm(ref))
    assert cos > 0.995, cos


def test_fp8_engine_run():
    model_fp = LlamaModel(CFG, mode="fp", dtype=jnp.float32)
    params = model_fp.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    qparams = quantize_params(params, QuantConfig(mode="weight_only_fp8"))
    qmodel = LlamaModel(CFG, mode="weight_only_fp8", dtype=jnp.float32)

    from protoquant_tpu.engine import Engine, EngineConfig

    eng = Engine(
        qmodel, qparams,
        EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=16,
                     max_new_tokens=6),
        kv_dtype=jnp.float8_e4m3fn,
    )
    rid = eng.add_request([3, 1, 4, 1, 5], 6)
    out = eng.run()[rid]
    assert len(out) == 6 and all(0 <= t < CFG.vocab_size for t in out)


def test_fp8_checkpoint_roundtrip(tmp_path):
    from protoquant_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    model = LlamaModel(CFG, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    qparams = quantize_params(params, QuantConfig(mode="weight_only_fp8"))
    save_checkpoint(str(tmp_path / "ck"), qparams, "{}")
    restored = restore_checkpoint(str(tmp_path / "ck"), qparams)
    a = qparams["params"]["layers_0"]["self_attn"]["q_proj"]["qkernel"]
    b = restored["params"]["layers_0"]["self_attn"]["q_proj"]["qkernel"]
    assert b.data.dtype == jnp.float8_e4m3fn
    np.testing.assert_array_equal(
        np.asarray(a.data.astype(jnp.float32)),
        np.asarray(b.data.astype(jnp.float32)),
    )
    np.testing.assert_array_equal(np.asarray(a.scale), np.asarray(b.scale))


def test_fp8_group_scales_roundtrip():
    """Group-wise fp8 (scale [K/g, N]): quantize->dequantize reconstruction
    beats per-channel on in-channel outlier weights (fp8's lane), and the
    group matmul matches the dequantized reference."""
    from protoquant_tpu.core.qtensor import QTensorF8
    from protoquant_tpu.ops import weight_only_fp8_group_matmul_xla

    rng = np.random.default_rng(0)
    K, N = 128, 64
    W = (rng.standard_normal((K, N)) * 0.05 *
         (1 + 19.0 * (rng.random((K, 1)) < 0.05))).astype(np.float32)
    per_ch = QTensorF8.quantize(jnp.asarray(W), axis=0)
    grouped = QTensorF8.quantize(jnp.asarray(W), axis=0, group=32)
    err = lambda qt: float(np.sqrt(np.mean(
        (np.asarray(qt.dequantize()) - W) ** 2)))
    assert err(grouped) < err(per_ch), (err(grouped), err(per_ch))

    x = jnp.asarray(rng.standard_normal((4, K)), jnp.float32)
    y = weight_only_fp8_group_matmul_xla(
        x, grouped.data, grouped.scale, 32, out_dtype=jnp.float32)
    ref = x @ grouped.dequantize()
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    # Large-M branch (materialized dequant) agrees with the grouped branch.
    xb = jnp.asarray(rng.standard_normal((128, K)), jnp.float32)
    yb = weight_only_fp8_group_matmul_xla(
        xb, grouped.data, grouped.scale, 32, out_dtype=jnp.float32)
    refb = xb @ grouped.dequantize()
    # The large-M branch materializes the dequantized weight in bf16 (the
    # dot rides bf16 lanes): ~0.4% relative, looser atol on small outputs.
    np.testing.assert_allclose(np.asarray(yb), np.asarray(refb),
                               rtol=2e-2, atol=1e-1)


def test_fp8_group_model_end_to_end():
    """weight_only_fp8 with fp8_group: quantize_params -> model apply -> fp
    logits tracked; greedy decode runs through the engine."""
    from protoquant_tpu.engine import Engine, EngineConfig
    from protoquant_tpu.nn import quantize_params
    from protoquant_tpu.utils.config import ModelConfig, QuantConfig

    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64,
    )
    fp_model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = fp_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    toks = jnp.asarray(
        np.random.default_rng(1).integers(0, 64, (2, 10)), jnp.int32)
    lfp = np.asarray(fp_model.apply(params, toks))

    qp = quantize_params(params, QuantConfig(mode="weight_only_fp8",
                                             fp8_group=32))
    qm = LlamaModel(cfg, mode="weight_only_fp8", fp8_group=32,
                    dtype=jnp.float32)
    lq = np.asarray(qm.apply(qp, toks))
    err = np.abs(lq - lfp).max() / (np.abs(lfp).max() + 1e-9)
    assert err < 0.1, err

    eng = Engine(qm, qp, EngineConfig(max_batch_size=2, max_seq_len=32,
                                      prefill_chunk=16, max_new_tokens=5),
                 kv_dtype=jnp.int8)
    rid = eng.add_request([1, 2, 3], 5)
    out = eng.run()[rid]
    assert len(out) == 5 and all(0 <= t < 64 for t in out)
