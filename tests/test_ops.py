"""M1: Pallas kernels vs the M0 pure-jnp reference.

Integer paths must match bit-exactly; fp32 epilogues to tight tolerance.
Runs in interpret mode on CPU; the same kernels compile on TPU (opt-in
`tpu`-marked smoke tests at the bottom)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protoquant_tpu.core import numerics
from protoquant_tpu import ops


def rand(shape, seed=0, scale=1.0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape) * scale).astype(dtype)


# ---------------------------------------------------------------------------
# rowquant
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "shape",
    [(8, 128), (256, 512), (3, 100), (1, 64), (130, 384)],
)
def test_rowquant_matches_reference(shape):
    x = jnp.asarray(rand(shape, seed=1, scale=4.0))
    xq, sx = ops.rowquant(x)
    xq_ref, sx_ref = numerics.quantize_rowwise(x)
    np.testing.assert_array_equal(np.asarray(xq), np.asarray(xq_ref))
    np.testing.assert_allclose(np.asarray(sx), np.asarray(sx_ref), rtol=1e-6)


def test_rowquant_3d_batch():
    x = jnp.asarray(rand((4, 17, 256), seed=2))
    xq, sx = ops.rowquant(x)
    xq_ref, sx_ref = numerics.quantize_rowwise(x)
    assert xq.shape == x.shape and sx.shape == (4, 17)
    np.testing.assert_array_equal(np.asarray(xq), np.asarray(xq_ref))


def test_rowquant_zero_rows():
    x = jnp.zeros((16, 128))
    xq, sx = ops.rowquant(x)
    assert np.all(np.isfinite(np.asarray(sx)))
    np.testing.assert_array_equal(np.asarray(xq), 0)


def test_rowquant_bf16_input():
    x = jnp.asarray(rand((32, 256), seed=3)).astype(jnp.bfloat16)
    xq, sx = ops.rowquant(x)
    xq_ref, sx_ref = numerics.quantize_rowwise(x)
    # bf16 inputs can land exactly on a .5 rounding tie where kernel vs
    # reference differ by one quantum; the f32 path (tests above) is exact.
    diff = np.abs(np.asarray(xq, np.int32) - np.asarray(xq_ref, np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3


# ---------------------------------------------------------------------------
# qmatmul (integer core bit-exact, epilogue tolerance)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "m,k,n",
    [
        (32, 128, 128),
        (64, 256, 96),  # n not multiple of 128 -> padding path
        (7, 300, 130),  # nothing aligned
        (1, 512, 256),  # decode-style single token
        (256, 1024, 512),  # multi-tile all dims
    ],
)
def test_qmatmul_matches_reference(m, k, n):
    rng = np.random.default_rng(5)
    xq = jnp.asarray(rng.integers(-127, 128, size=(m, k), dtype=np.int8))
    wq = jnp.asarray(rng.integers(-127, 128, size=(k, n), dtype=np.int8))
    s_x = jnp.asarray(rng.uniform(0.01, 0.1, size=(m,)).astype(np.float32))
    s_w = jnp.asarray(rng.uniform(0.01, 0.1, size=(n,)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    y = ops.qmatmul(xq, wq, s_x, s_w, b, block_m=32, block_n=128, block_k=128)
    y_ref = numerics.qmatmul_ref(xq, wq, s_x, s_w, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-6, atol=1e-6)


def test_qmatmul_large_m_auto_blocks():
    """M >= 512 flips the auto chooser to the prefill tile branch
    (512-edge blocks, deep k) — exactness must hold there too."""
    rng = np.random.default_rng(11)
    m, k, n = 512, 384, 256  # k/n smaller than the preferred blocks: clamp path
    xq = jnp.asarray(rng.integers(-127, 128, size=(m, k), dtype=np.int8))
    wq = jnp.asarray(rng.integers(-127, 128, size=(k, n), dtype=np.int8))
    s_x = jnp.asarray(rng.uniform(0.01, 0.1, size=(m,)).astype(np.float32))
    s_w = jnp.asarray(rng.uniform(0.01, 0.1, size=(n,)).astype(np.float32))
    y = ops.qmatmul(xq, wq, s_x, s_w)  # no overrides: exercises auto blocks
    y_ref = numerics.qmatmul_ref(xq, wq, s_x, s_w, None)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-6, atol=1e-6)


def test_qmatmul_integer_core_bit_exact():
    """With unit scales and no bias, output == exact int32 accumulator."""
    rng = np.random.default_rng(6)
    m, k, n = 64, 384, 128
    xq = jnp.asarray(rng.integers(-127, 128, size=(m, k), dtype=np.int8))
    wq = jnp.asarray(rng.integers(-127, 128, size=(k, n), dtype=np.int8))
    ones_m, ones_n = jnp.ones((m,)), jnp.ones((n,))
    y = ops.qmatmul(xq, wq, ones_m, ones_n, block_m=32, block_n=128, block_k=128)
    acc = numerics.int_matmul(xq, wq)
    np.testing.assert_array_equal(np.asarray(y).astype(np.int64), np.asarray(acc))


def test_qmatmul_no_bias_and_dtype():
    rng = np.random.default_rng(7)
    xq = jnp.asarray(rng.integers(-10, 10, size=(16, 128), dtype=np.int8))
    wq = jnp.asarray(rng.integers(-10, 10, size=(128, 128), dtype=np.int8))
    s_x = jnp.full((16,), 0.5, jnp.float32)
    s_w = jnp.full((128,), 0.25, jnp.float32)
    y = ops.qmatmul(xq, wq, s_x, s_w, out_dtype=jnp.bfloat16)
    assert y.dtype == jnp.bfloat16
    y_ref = numerics.qmatmul_ref(xq, wq, s_x, s_w, out_dtype=jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32), rtol=1e-2
    )


def test_dynamic_qlinear_end_to_end():
    x = jnp.asarray(rand((24, 512), seed=8, scale=0.7))
    w = jnp.asarray(rand((512, 256), seed=9, scale=0.05))
    b = jnp.asarray(rand((256,), seed=10))
    wq, s_w = numerics.quantize_channelwise(w, axis=0)
    y = ops.dynamic_qlinear(x, wq, s_w, b)
    y_ref = numerics.dynamic_qlinear_ref(x, wq, s_w, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5)


def test_qmatmul_3d_batch():
    rng = np.random.default_rng(11)
    xq = jnp.asarray(rng.integers(-50, 50, size=(2, 8, 128), dtype=np.int8))
    wq = jnp.asarray(rng.integers(-50, 50, size=(128, 64), dtype=np.int8))
    s_x = jnp.asarray(rng.uniform(0.01, 0.1, size=(2, 8)).astype(np.float32))
    s_w = jnp.asarray(rng.uniform(0.01, 0.1, size=(64,)).astype(np.float32))
    y = ops.qmatmul(xq, wq, s_x, s_w)
    y_ref = numerics.qmatmul_ref(
        xq.reshape(16, 128), wq, s_x.reshape(16), s_w
    ).reshape(2, 8, 64)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-6)


# ---------------------------------------------------------------------------
# weight-only matmul
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("m,k,n", [(16, 256, 128), (5, 200, 96), (128, 512, 512)])
def test_weight_only_matmul(m, k, n):
    x = jnp.asarray(rand((m, k), seed=12, scale=0.5))
    w = jnp.asarray(rand((k, n), seed=13, scale=0.05))
    b = jnp.asarray(rand((n,), seed=14))
    wq, s_w = numerics.quantize_channelwise(w, axis=0)
    y = ops.weight_only_matmul(x, wq, s_w, b)
    # Ground truth in f64: the kernel factorizes s_w into the epilogue, so it
    # differs from the scale-first jnp reference only by f32 accumulation
    # order; both must sit within f32-accumulation distance of the f64 truth.
    xt = np.asarray(x, np.float64)
    wt = np.asarray(wq, np.float64) * np.asarray(s_w, np.float64)[None, :]
    y_true = xt @ wt + np.asarray(b, np.float64)
    np.testing.assert_allclose(np.asarray(y), y_true, rtol=1e-3, atol=5e-3)


def test_weight_only_matmul_bf16():
    x = jnp.asarray(rand((32, 256), seed=15)).astype(jnp.bfloat16)
    w = jnp.asarray(rand((256, 128), seed=16, scale=0.05))
    wq, s_w = numerics.quantize_channelwise(w, axis=0)
    y = ops.weight_only_matmul(x, wq, s_w)
    assert y.dtype == jnp.bfloat16
    y_ref = numerics.weight_only_linear_ref(x, wq, s_w)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32), rtol=3e-2, atol=3e-2
    )


# ---------------------------------------------------------------------------
# dequant
# ---------------------------------------------------------------------------


def test_dequant_per_channel():
    w = jnp.asarray(rand((256, 96), seed=17, scale=2.0))
    wq, s_w = numerics.quantize_channelwise(w, axis=0)
    out = ops.dequant(wq, s_w, axis=0)
    ref = numerics.dequantize(wq, s_w, 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_dequant_per_row():
    x = jnp.asarray(rand((48, 256), seed=18, scale=2.0))
    xq, s_x = numerics.quantize_rowwise(x)
    out = ops.dequant(xq, s_x, axis=1)
    ref = numerics.dequantize(xq, s_x, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


# ---------------------------------------------------------------------------
# TPU compiled smoke tests (opt-in: RUN_TPU_TESTS=1)
# ---------------------------------------------------------------------------


@pytest.mark.tpu
def test_tpu_qmatmul_compiled():
    rng = np.random.default_rng(20)
    m, k, n = 128, 512, 512
    xq = jnp.asarray(rng.integers(-127, 128, size=(m, k), dtype=np.int8))
    wq = jnp.asarray(rng.integers(-127, 128, size=(k, n), dtype=np.int8))
    s_x = jnp.asarray(rng.uniform(0.01, 0.1, size=(m,)).astype(np.float32))
    s_w = jnp.asarray(rng.uniform(0.01, 0.1, size=(n,)).astype(np.float32))
    y = ops.qmatmul(xq, wq, s_x, s_w, interpret=False)
    y_ref = numerics.qmatmul_ref(xq, wq, s_x, s_w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5)


@pytest.mark.tpu
def test_tpu_rowquant_compiled():
    x = jnp.asarray(rand((256, 1024), seed=21))
    xq, sx = ops.rowquant(x, interpret=False)
    xq_ref, sx_ref = numerics.quantize_rowwise(x)
    np.testing.assert_array_equal(np.asarray(xq), np.asarray(xq_ref))


def test_rms_norm_quant_matches_unfused():
    """Fused norm+rowquant kernel vs the module composition: scales match to
    float tolerance; int8 codes may flip only +-1 on rounding boundaries
    (reduction-order effects), <0.1% of elements."""
    import jax

    from protoquant_tpu.core.numerics import quantize_rowwise
    from protoquant_tpu.ops.fused_quant import rms_norm_quant

    rng = np.random.default_rng(3)
    B, T, K = 2, 37, 256
    eps = 1e-5
    x = jnp.asarray(rng.standard_normal((B, T, K)) * 2, jnp.bfloat16)
    w = jnp.asarray(rng.uniform(0.5, 1.5, (K,)), jnp.float32)

    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = (xf * jax.lax.rsqrt(var + eps) * w).astype(jnp.bfloat16)
    q_ref, s_ref = quantize_rowwise(y)

    q, s = rms_norm_quant(x, w, eps=eps, interpret=True)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-6)
    dq = np.abs(np.asarray(q, np.int32) - np.asarray(q_ref, np.int32))
    assert dq.max() <= 1, dq.max()
    assert (dq != 0).mean() < 1e-3, (dq != 0).mean()


@pytest.mark.parametrize("act", ["silu", "gelu"])
def test_swiglu_quant_matches_unfused(act):
    import jax

    from protoquant_tpu.core.numerics import quantize_rowwise
    from protoquant_tpu.ops.fused_quant import swiglu_quant

    rng = np.random.default_rng(4)
    B, T, I = 2, 21, 384
    g = jnp.asarray(rng.standard_normal((B, T, I)) * 2, jnp.bfloat16)
    u = jnp.asarray(rng.standard_normal((B, T, I)) * 2, jnp.bfloat16)
    actf = jax.nn.silu if act == "silu" else lambda v: jax.nn.gelu(v, approximate=True)
    h = actf(g.astype(jnp.float32)).astype(jnp.bfloat16) * u
    q_ref, s_ref = quantize_rowwise(h)

    q, s = swiglu_quant(g, u, act=act, interpret=True)
    # The gate transcendental (sigmoid/tanh) can differ by 1 bf16 ulp between
    # the kernel and module lowerings, so scales carry that ulp and codes can
    # flip by +-1 — pure quantization-level noise.
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-2)
    dq = np.abs(np.asarray(q, np.int32) - np.asarray(q_ref, np.int32))
    assert dq.max() <= 1, dq.max()
    assert (dq != 0).mean() < 0.05, (dq != 0).mean()
