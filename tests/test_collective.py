"""Collective (overlapped) qmatmul vs the plain psum path, simulated mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from protoquant_tpu.core import numerics
from protoquant_tpu.parallel.collective import (
    qmatmul_allreduce_overlapped,
    qmatmul_reduce_scatter,
)

# Subsystem matrix: full-coverage tier (fast tier: -m 'not slow').
pytestmark = pytest.mark.slow

needs_8dev = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


def _mesh(tp):
    return Mesh(np.asarray(jax.devices()[:tp]), ("model",))


@needs_8dev
@pytest.mark.parametrize("tp", [2, 4])
def test_reduce_scatter_matmul_matches_psum(tp):
    """Ring RS-matmul == psum of local products, chunk-selected."""
    rng = np.random.default_rng(0)
    M, K, N = 16, 64 * tp, 128 * tp
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32) * 0.5)
    w = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32) * 0.05)
    wq, s_w = numerics.quantize_channelwise(w, axis=0)

    mesh = _mesh(tp)

    @jax.jit
    @jax.shard_map(
        mesh=mesh,
        in_specs=(P(None, "model"), P("model", None), P()),
        out_specs=P(None, "model"),
        check_vma=False,
    )
    def rs(x_local, wq_local, s_w_full):
        return qmatmul_reduce_scatter(
            x_local, wq_local, s_w_full, "model", tp, out_dtype=jnp.float32
        )

    @jax.jit
    @jax.shard_map(
        mesh=mesh,
        in_specs=(P(None, "model"), P("model", None), P()),
        out_specs=P(None, None),
        check_vma=False,
    )
    def psum_ref(x_local, wq_local, s_w_full):
        from protoquant_tpu import ops

        y = ops.dynamic_qlinear(x_local, wq_local, s_w_full, out_dtype=jnp.float32)
        return jax.lax.psum(y, "model")

    got = np.asarray(rs(x, wq, s_w))  # [M, N] assembled from chunks
    ref = np.asarray(psum_ref(x, wq, s_w))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@needs_8dev
def test_allreduce_overlapped_matches_psum(tp=4):
    rng = np.random.default_rng(1)
    M, K, N = 8, 64 * tp, 128 * tp
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32) * 0.5)
    w = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32) * 0.05)
    wq, s_w = numerics.quantize_channelwise(w, axis=0)
    mesh = _mesh(tp)

    @jax.jit
    @jax.shard_map(
        mesh=mesh,
        in_specs=(P(None, "model"), P("model", None), P()),
        out_specs=P(None, None),
        check_vma=False,
    )
    def ar(x_local, wq_local, s_w_full):
        return qmatmul_allreduce_overlapped(
            x_local, wq_local, s_w_full, "model", tp, out_dtype=jnp.float32
        )

    @jax.jit
    @jax.shard_map(
        mesh=mesh,
        in_specs=(P(None, "model"), P("model", None), P()),
        out_specs=P(None, None),
        check_vma=False,
    )
    def psum_ref(x_local, wq_local, s_w_full):
        from protoquant_tpu import ops

        y = ops.dynamic_qlinear(x_local, wq_local, s_w_full, out_dtype=jnp.float32)
        return jax.lax.psum(y, "model")

    np.testing.assert_allclose(
        np.asarray(ar(x, wq, s_w)), np.asarray(psum_ref(x, wq, s_w)), rtol=1e-5, atol=1e-5
    )


# -- product-path wiring (VERDICT round-1 item 3) ---------------------------


@needs_8dev
@pytest.mark.parametrize("mode", ["dynamic", "weight_only"])
def test_tp_model_collective_matches_psum_path(mode):
    """tp_model(collective=True) routes o_proj/down_proj through the ring
    collective matmul; logits must match the plain-psum TP model (same
    quantized weights, same rowquant points — only the reduction schedule
    differs, so agreement is to f32 summation tolerance)."""
    from protoquant_tpu.models import LlamaModel
    from protoquant_tpu.nn import quantize_params
    from protoquant_tpu.parallel import build_tp_score, make_mesh, shard_params, tp_model
    from protoquant_tpu.utils.config import MeshConfig, ModelConfig, QuantConfig

    cfg = ModelConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=64,
    )
    fp = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = fp.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    qparams = quantize_params(params, QuantConfig(mode=mode))
    tokens = jnp.asarray(
        np.random.default_rng(5).integers(0, cfg.vocab_size, (2, 8)), jnp.int32
    )

    mesh = make_mesh(MeshConfig(dp=1, tp=4), jax.devices()[:4])
    sparams = shard_params(qparams, mesh)

    model_psum = tp_model(cfg, mode, mesh, dtype=jnp.float32)
    model_coll = tp_model(cfg, mode, mesh, dtype=jnp.float32, collective=True)
    with mesh:
        ref = np.asarray(build_tp_score(model_psum, mesh, qparams)(sparams, tokens))
        got = np.asarray(build_tp_score(model_coll, mesh, qparams)(sparams, tokens))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@needs_8dev
def test_tp_sp_model_collective_matches_psum_path():
    """SP + collective: the token-chunked ring reduce-scatter lands in the
    same token-sharded layout as psum_scatter."""
    from protoquant_tpu.models import LlamaModel
    from protoquant_tpu.nn import quantize_params
    from protoquant_tpu.parallel import build_tp_score, make_mesh, shard_params, tp_model
    from protoquant_tpu.utils.config import MeshConfig, ModelConfig, QuantConfig

    cfg = ModelConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=64,
    )
    fp = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = fp.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    qparams = quantize_params(params, QuantConfig(mode="dynamic"))
    tokens = jnp.asarray(
        np.random.default_rng(6).integers(0, cfg.vocab_size, (2, 8)), jnp.int32
    )

    mesh = make_mesh(MeshConfig(dp=1, tp=4), jax.devices()[:4])
    sparams = shard_params(qparams, mesh)
    model_psum = tp_model(cfg, "dynamic", mesh, dtype=jnp.float32, sp=True)
    model_coll = tp_model(
        cfg, "dynamic", mesh, dtype=jnp.float32, sp=True, collective=True
    )
    with mesh:
        ref = np.asarray(build_tp_score(model_psum, mesh, qparams)(sparams, tokens))
        got = np.asarray(build_tp_score(model_coll, mesh, qparams)(sparams, tokens))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


# -- explicit-DMA Pallas ring (ops/collective_matmul.py; VERDICT r2 item 5) --


@needs_8dev
@pytest.mark.parametrize("tp", [2, 4])
def test_dma_ring_integer_exact_vs_ppermute(tp):
    """The explicit-DMA ring's integer arithmetic (schedule, DMA payloads,
    accumulation order) is BITWISE identical to the ppermute tier: with unit
    scales every value is an exactly-representable int32 sum, so any
    scheduling or payload bug shows as a hard mismatch."""
    import functools

    from jax.experimental.pallas import tpu as pltpu

    from protoquant_tpu.ops.collective_matmul import qmatmul_reduce_scatter_dma

    rng = np.random.default_rng(1)
    M, K, N = 8, 32 * tp, 32 * tp
    xq = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    ones_m = jnp.ones((M,), jnp.float32)
    wq = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    ones_n = jnp.ones((N,), jnp.float32)
    mesh = _mesh(tp)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, "model"), P(), P("model", None), P()),
        out_specs=P(None, "model"), check_vma=False,
    )
    def dma_rs(xq, sx, wq, sw):
        # detect_races=True: the interpreter additionally proves the
        # credit-based flow control race-free.
        return qmatmul_reduce_scatter_dma(
            xq, sx, wq, sw, axis="model", tp=tp,
            interpret=pltpu.InterpretParams(detect_races=True),
        )

    out = np.asarray(dma_rs(xq, ones_m, wq, ones_n))
    ref = (
        np.asarray(xq, np.int32) @ np.asarray(wq, np.int32)
    ).astype(np.float32)
    np.testing.assert_array_equal(out, ref)


@needs_8dev
def test_dma_ring_real_scales_matches_ppermute(tp=4):
    """With real f32 scales the two tiers agree to FMA-contraction ulps
    (separately-compiled programs may contract the epilogue multiply into
    the ring add differently; the int32 ring itself is exact — see the
    integer test above)."""
    import functools

    from protoquant_tpu import ops
    from protoquant_tpu.ops.collective_matmul import qmatmul_reduce_scatter_dma

    rng = np.random.default_rng(2)
    M, K, N = 8, 16 * tp, 16 * tp
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32) * 0.05)
    wq, s_w = numerics.quantize_channelwise(w, axis=0)
    mesh = _mesh(tp)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, "model"), P("model", None), P()),
        out_specs=P(None, "model"), check_vma=False,
    )
    def dma_rs(x, wq, sw):
        xq, sx = ops.rowquant(x, interpret=True)
        return qmatmul_reduce_scatter_dma(
            xq, sx, wq, sw, axis="model", tp=tp, interpret=True
        )

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, "model"), P("model", None), P()),
        out_specs=P(None, "model"), check_vma=False,
    )
    def pp_rs(x, wq, sw):
        return qmatmul_reduce_scatter(
            x, wq, sw, "model", tp, out_dtype=jnp.float32, interpret=True
        )

    out = np.asarray(dma_rs(x, wq, s_w))
    ref = np.asarray(pp_rs(x, wq, s_w))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


@needs_8dev
def test_dma_ring_product_path_matches_ppermute(tp=4):
    """RING_BACKEND='dma' routes QLinear's collective reduction through the
    explicit-DMA kernel; the product-path wrapper (quantize + ring +
    all_gather) must agree with the ppermute tier it replaces."""
    import functools

    from protoquant_tpu.parallel import collective as coll
    from protoquant_tpu.parallel.collective import dynamic_qlinear_collective

    rng = np.random.default_rng(3)
    B, T, K, N = 2, 4, 16 * tp, 16 * tp
    x = jnp.asarray(rng.standard_normal((B, T, K)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32) * 0.05)
    wq, s_w = numerics.quantize_channelwise(w, axis=0)
    mesh = _mesh(tp)

    def run():
        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(None, None, "model"), P("model", None), P()),
            out_specs=P(), check_vma=False,
        )
        def f(x, wq, sw):
            return dynamic_qlinear_collective(
                x, wq, sw, "model", tp, out_dtype=jnp.float32, interpret=True
            )

        return np.asarray(f(x, wq, s_w))

    old = coll.RING_BACKEND
    try:
        coll.RING_BACKEND = "dma"
        out = run()
    finally:
        coll.RING_BACKEND = old
    ref = run()
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@needs_8dev
def test_lora_rides_collective_ring(tp=4):
    """LoRA x collective ring (VERDICT r3 item 9): the adapter's K-sharded
    rank-r partial reduces via its own psum and adds onto the ring's
    reduced output — logits match the plain-psum TP model with the SAME
    (nonzero) adapters to f32 reduction tolerance."""
    from protoquant_tpu.models import LlamaModel
    from protoquant_tpu.nn import quantize_params
    from protoquant_tpu.nn.lora import attach_lora
    from protoquant_tpu.parallel import (
        build_tp_score, make_mesh, shard_params, tp_model,
    )
    from protoquant_tpu.utils.config import MeshConfig, ModelConfig, QuantConfig

    cfg = ModelConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=64,
    )
    targets = ("q_proj", "o_proj", "down_proj")  # o/down are row-parallel:
    #                                              they ride the ring
    fp = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = fp.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    qparams = quantize_params(params, QuantConfig(mode="dynamic"))
    qparams = attach_lora(qparams, rank=4, targets=targets)

    # attach_lora inits B = 0 (identity adapters) — randomize so the
    # adapter path actually contributes to the logits.
    rng = np.random.default_rng(7)

    def randomize_b(tree):
        if isinstance(tree, dict):
            return {
                k: (
                    jnp.asarray(
                        rng.standard_normal(v.shape).astype(np.float32) * 0.05
                    )
                    if k == "lora_b"
                    else randomize_b(v)
                )
                for k, v in tree.items()
            }
        return tree

    qparams = randomize_b(qparams)
    tokens = jnp.asarray(
        np.random.default_rng(5).integers(0, cfg.vocab_size, (2, 8)),
        jnp.int32,
    )

    mesh = make_mesh(MeshConfig(dp=1, tp=tp), jax.devices()[:tp])
    sparams = shard_params(qparams, mesh)
    kw = dict(dtype=jnp.float32, lora_rank=4, lora_targets=targets)
    model_psum = tp_model(cfg, "dynamic", mesh, **kw)
    model_coll = tp_model(cfg, "dynamic", mesh, collective=True, **kw)
    with mesh:
        ref = np.asarray(
            build_tp_score(model_psum, mesh, qparams)(sparams, tokens)
        )
        got = np.asarray(
            build_tp_score(model_coll, mesh, qparams)(sparams, tokens)
        )
    # Adapters must be load-bearing: zero-adapter logits differ.
    base = quantize_params(params, QuantConfig(mode="dynamic"))
    base = attach_lora(base, rank=4, targets=targets)
    sbase = shard_params(base, mesh)
    with mesh:
        noad = np.asarray(
            build_tp_score(model_psum, mesh, base)(sbase, tokens)
        )
    assert np.abs(ref - noad).max() > 1e-3
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
