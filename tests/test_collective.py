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
