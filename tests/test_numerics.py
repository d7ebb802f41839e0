"""M0: pin the numerics contract against the torch CPU oracle.

torch._int_mm (int8 x int8 -> int32) is the exact primitive family the
reference's CUTLASS GEMM belongs to (SURVEY.md §0.2 [ENV]); torch.round pins
the reference's rounding mode. These tests make the contract bit-exact.

Also covers acceptance config 1 (BASELINE.json:7): 4096x4096 linear, int8
dynamic vs fp32, max-abs-err + cosine similarity on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protoquant_tpu.core import QTensor, numerics

try:
    import torch

    HAS_TORCH = True
except Exception:  # pragma: no cover
    HAS_TORCH = False

needs_torch = pytest.mark.skipif(not HAS_TORCH, reason="torch unavailable")


def rand(shape, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape) * scale).astype(np.float32)


# ---------------------------------------------------------------------------
# Quantization semantics
# ---------------------------------------------------------------------------


@needs_torch
@pytest.mark.parametrize("shape", [(16, 64), (33, 127), (1, 8)])
def test_rounding_matches_torch(shape):
    """jnp.round == torch.round (round-half-to-even), incl. exact .5 cases."""
    x = rand(shape, seed=1, scale=3.0)
    # Inject exact half values to force the tie-breaking path.
    x.flat[:: max(1, x.size // 16)] = np.arange(-8, 8)[: len(x.flat[:: max(1, x.size // 16)])] + 0.5
    ours = np.asarray(jnp.round(jnp.asarray(x)))
    theirs = torch.round(torch.from_numpy(x)).numpy()
    np.testing.assert_array_equal(ours, theirs)


@needs_torch
def test_rowwise_quantize_matches_torch_reference():
    """Full per-row dynamic quantization vs a torch reimplementation."""
    x = rand((64, 256), seed=2, scale=5.0)
    xq, s_x = numerics.quantize_rowwise(jnp.asarray(x))

    t = torch.from_numpy(x)
    t_amax = t.abs().amax(dim=-1)
    t_s = torch.clamp(t_amax / 127.0, min=numerics.SCALE_EPS)
    t_q = torch.clamp(torch.round(t / t_s[:, None]), -127, 127).to(torch.int8)

    np.testing.assert_allclose(np.asarray(s_x), t_s.numpy(), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(xq), t_q.numpy())


def test_quantize_clamp_range_symmetric():
    x = jnp.array([[-1000.0, 1000.0, 0.0, 1.0]])
    xq, s = numerics.quantize_rowwise(x)
    assert int(xq.min()) == -127 and int(xq.max()) == 127


def test_zero_row_no_nan():
    x = jnp.zeros((4, 32))
    xq, s = numerics.quantize_rowwise(x)
    assert np.all(np.isfinite(np.asarray(s)))
    np.testing.assert_array_equal(np.asarray(xq), 0)
    y = numerics.qmatmul_ref(xq, jnp.zeros((32, 8), jnp.int8), s, jnp.ones((8,)))
    assert np.all(np.isfinite(np.asarray(y)))


# ---------------------------------------------------------------------------
# Integer GEMM vs torch._int_mm (the bit-exact oracle)
# ---------------------------------------------------------------------------


@needs_torch
@pytest.mark.parametrize("m,k,n", [(32, 64, 48), (17, 128, 32), (128, 256, 128)])
def test_int_matmul_bit_exact_vs_int_mm(m, k, n):
    rng = np.random.default_rng(3)
    xq = rng.integers(-127, 128, size=(m, k), dtype=np.int8)
    wq = rng.integers(-127, 128, size=(k, n), dtype=np.int8)
    ours = np.asarray(numerics.int_matmul(jnp.asarray(xq), jnp.asarray(wq)))
    # torch._int_mm requires m>16 on some builds; fall back to int32 matmul.
    try:
        theirs = torch._int_mm(torch.from_numpy(xq), torch.from_numpy(wq)).numpy()
    except Exception:
        theirs = (xq.astype(np.int32) @ wq.astype(np.int32))
    np.testing.assert_array_equal(ours, theirs)
    assert ours.dtype == np.int32


@needs_torch
def test_full_dynamic_path_vs_torch_pipeline():
    """End-to-end dynamic path vs an all-torch reimplementation (bit-exact
    integers, fp32-tolerance epilogue)."""
    x = rand((48, 256), seed=4)
    w = rand((256, 96), seed=5)
    b = rand((96,), seed=6)

    y_ours = numerics.dynamic_qlinear_ref(
        jnp.asarray(x), *_quant_w(w), bias=jnp.asarray(b)
    )

    tx, tw, tb = map(torch.from_numpy, (x, w, b))
    s_w = torch.clamp(tw.abs().amax(dim=0) / 127.0, min=numerics.SCALE_EPS)
    wq = torch.clamp(torch.round(tw / s_w), -127, 127).to(torch.int8)
    s_x = torch.clamp(tx.abs().amax(dim=-1) / 127.0, min=numerics.SCALE_EPS)
    xq = torch.clamp(torch.round(tx / s_x[:, None]), -127, 127).to(torch.int8)
    acc = torch._int_mm(xq, wq)
    y_torch = acc.to(torch.float32) * s_x[:, None] * s_w[None, :] + tb

    np.testing.assert_allclose(np.asarray(y_ours), y_torch.numpy(), rtol=1e-5, atol=1e-5)


def _quant_w(w):
    wq, s_w = numerics.quantize_channelwise(jnp.asarray(w), axis=0)
    return wq, s_w


# ---------------------------------------------------------------------------
# QTensor container
# ---------------------------------------------------------------------------


def test_qtensor_roundtrip_error_bound():
    w = rand((128, 64), seed=7, scale=2.0)
    qt = QTensor.quantize(jnp.asarray(w), axis=0)
    w_hat = np.asarray(qt.dequantize())
    # Max error per channel is bounded by scale/2 (one quantization step).
    bound = np.asarray(qt.scale) / 2 + 1e-8
    assert np.all(np.abs(w_hat - w).max(axis=0) <= bound)


def test_qtensor_is_pytree():
    qt = QTensor.quantize(jnp.asarray(rand((32, 16))), axis=0)
    leaves, treedef = jax.tree_util.tree_flatten(qt)
    assert len(leaves) == 2
    qt2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert qt2.axis == qt.axis
    # jit through a QTensor argument
    f = jax.jit(lambda q: q.dequantize())
    np.testing.assert_allclose(np.asarray(f(qt)), np.asarray(qt.dequantize()))


def test_qtensor_transpose():
    w = rand((32, 16), seed=8)
    qt = QTensor.quantize(jnp.asarray(w), axis=0)
    qtt = qt.transpose()
    assert qtt.shape == (16, 32) and qtt.axis == 1
    np.testing.assert_allclose(
        np.asarray(qtt.dequantize()), np.asarray(qt.dequantize()).T
    )


# ---------------------------------------------------------------------------
# Acceptance config 1 (BASELINE.json:7): 4096x4096 linear on CPU
# ---------------------------------------------------------------------------


def test_acceptance_config1_4096_linear():
    m, k, n = 64, 4096, 4096
    x = rand((m, k), seed=10, scale=0.5)
    w = rand((k, n), seed=11, scale=0.02)
    b = rand((n,), seed=12, scale=0.1)

    y_fp32 = x @ w + b
    wq, s_w = numerics.quantize_channelwise(jnp.asarray(w), axis=0)
    y_int8 = np.asarray(
        numerics.dynamic_qlinear_ref(jnp.asarray(x), wq, s_w, jnp.asarray(b))
    )

    cos = np.sum(y_fp32 * y_int8) / (
        np.linalg.norm(y_fp32) * np.linalg.norm(y_int8) + 1e-12
    )
    max_abs_err = np.abs(y_fp32 - y_int8).max()
    rel = max_abs_err / (np.abs(y_fp32).max() + 1e-12)
    assert cos > 0.999, f"cosine {cos}"
    assert rel < 0.05, f"relative max-abs-err {rel}"


def test_weight_only_path_close_to_fp():
    x = rand((16, 512), seed=13)
    w = rand((512, 128), seed=14, scale=0.05)
    wq, s_w = numerics.quantize_channelwise(jnp.asarray(w), axis=0)
    y_fp = x @ w
    y_wo = np.asarray(numerics.weight_only_linear_ref(jnp.asarray(x), wq, s_w))
    cos = np.sum(y_fp * y_wo) / (np.linalg.norm(y_fp) * np.linalg.norm(y_wo) + 1e-12)
    assert cos > 0.9999
