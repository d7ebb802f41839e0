"""M7: context-parallel / ring / Ulysses attention vs single-device oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from protoquant_tpu.models.llama import mha_attention
from protoquant_tpu.ops.attention import int8_kv_attention_xla
from protoquant_tpu.parallel.context import (
    cp_int8_attend_decode,
    local_valid_lengths,
    ring_attention,
    ulysses_attention,
)

# Subsystem matrix: full-coverage tier (fast tier: -m 'not slow').
pytestmark = pytest.mark.slow

needs_8dev = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)

CP = 4


def _mesh():
    return Mesh(np.asarray(jax.devices()[:CP]), ("seq",))


def rand(shape, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray((rng.standard_normal(shape) * scale).astype(np.float32))


@needs_8dev
def test_cp_decode_matches_single_device():
    B, KV, G, S, Dh, T = 2, 2, 2, 64, 32, 1
    H = KV * G
    rng = np.random.default_rng(0)
    q = rand((B, T, H, Dh), seed=1, scale=0.5)
    kq = jnp.asarray(rng.integers(-127, 128, (B, KV, S, Dh), dtype=np.int8))
    vq = jnp.asarray(rng.integers(-127, 128, (B, KV, S, Dh), dtype=np.int8))
    ks = jnp.asarray(rng.uniform(0.005, 0.02, (B, KV, S)).astype(np.float32))
    vs = jnp.asarray(rng.uniform(0.005, 0.02, (B, KV, S)).astype(np.float32))
    lengths = jnp.asarray([37, 55], jnp.int32)

    ref = np.asarray(int8_kv_attention_xla(q, kq, ks, vq, vs, lengths))

    mesh = _mesh()

    @jax.jit
    @jax.shard_map(
        mesh=mesh,
        in_specs=(P(), P(None, None, "seq", None), P(None, None, "seq"),
                  P(None, None, "seq", None), P(None, None, "seq"), P()),
        out_specs=P(),
        check_vma=False,
    )
    def cp(q, kq, ks, vq, vs, lengths):
        return cp_int8_attend_decode(q, kq, ks, vq, vs, lengths, "seq")

    got = np.asarray(cp(q, kq, ks, vq, vs, lengths))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@needs_8dev
def test_local_valid_lengths():
    mesh = _mesh()

    @jax.jit
    @jax.shard_map(mesh=mesh, in_specs=P(), out_specs=P("seq"), check_vma=False)
    def f(gl):
        return local_valid_lengths(gl, "seq", 16)[None]

    out = np.asarray(f(jnp.asarray([37], jnp.int32)))  # shards of 16: 16,16,5,0
    np.testing.assert_array_equal(out[:, 0], [16, 16, 5, 0])


@needs_8dev
def test_ring_attention_matches_full_causal():
    B, H, KV, Dh, T = 2, 4, 2, 32, 32
    q = rand((B, T, H, Dh), seed=2, scale=0.5)
    k = rand((B, T, KV, Dh), seed=3, scale=0.5)
    v = rand((B, T, KV, Dh), seed=4, scale=0.5)
    positions = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    ref = np.asarray(mha_attention(q, k, v, positions, positions))

    mesh = _mesh()

    @jax.jit
    @jax.shard_map(
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq"), P(None, "seq")),
        out_specs=P(None, "seq"),
        check_vma=False,
    )
    def ring(q, k, v, pos):
        return ring_attention(q, k, v, pos, "seq", CP)

    got = np.asarray(ring(q, k, v, positions))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@needs_8dev
def test_ulysses_attention_matches_full_causal():
    B, H, KV, Dh, T = 2, 8, 4, 32, 32
    q = rand((B, T, H, Dh), seed=5, scale=0.5)
    k = rand((B, T, KV, Dh), seed=6, scale=0.5)
    v = rand((B, T, KV, Dh), seed=7, scale=0.5)
    positions = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    ref = np.asarray(mha_attention(q, k, v, positions, positions))

    mesh = _mesh()

    @jax.jit
    @jax.shard_map(
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq"), P()),
        out_specs=P(None, "seq"),
        check_vma=False,
    )
    def uly(q, k, v, pos_full):
        return ulysses_attention(q, k, v, pos_full, "seq", CP)

    got = np.asarray(uly(q, k, v, positions))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@needs_8dev
def test_model_level_cp_score_matches_single_device():
    """Ring attention integrated in the model tier: seq-sharded scoring ==
    single device (fp exact)."""
    from protoquant_tpu.models import LlamaModel
    from protoquant_tpu.parallel import build_cp_score
    from protoquant_tpu.parallel.mesh import Mesh as _unused  # noqa
    from protoquant_tpu.utils.config import ModelConfig

    cfg = ModelConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64,
    )
    single = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = single.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    tokens = jnp.asarray(
        np.random.default_rng(11).integers(0, 128, (2, 32)), jnp.int32
    )
    ref = np.asarray(single.apply(params, tokens))

    mesh = Mesh(np.asarray(jax.devices()[:CP]), ("seq",))
    fwd = build_cp_score(cfg, "fp", mesh, "seq", dtype=jnp.float32)
    with mesh:
        got = np.asarray(fwd(params, tokens))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)
