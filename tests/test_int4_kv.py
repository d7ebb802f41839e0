"""INT4 KV cache: packed-nibble dense cache + in-kernel-unpack flash kernel.

Gates: (1) pack/unpack round trip is exact on the nibble values; (2) the
Pallas int4 flash kernel (interpret mode here, compiled on TPU) matches the
unpack + int8-XLA oracle on the same nibbles bit-for-bit in f32 lanes;
(3) cache-consistency: scoring vs per-token cached decode track within
int4-quantization tolerance and greedy choices mostly agree; (4) the
continuous-batching engine serves with kv_dtype=jnp.int4 end-to-end;
(5) prefill chunks landing both nibbles of one byte merge correctly (the
two-phase parity write).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protoquant_tpu.models import LlamaModel, init_cache
from protoquant_tpu.models.kv_cache import Int4KVCache, quantize_kv4
from protoquant_tpu.utils.config import ModelConfig

# Subsystem matrix: full-coverage tier (fast tier: -m 'not slow').
pytestmark = pytest.mark.slow

CFG = ModelConfig(
    vocab_size=64, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=64,
)


def test_pack_roundtrip_exact():
    rng = np.random.default_rng(0)
    B, T, KV, Dh = 2, 12, 2, 16
    x = jnp.asarray(rng.standard_normal((B, T, KV, Dh)), jnp.float32)
    cache = Int4KVCache.init(B, 32, KV, Dh)
    new = cache.update(x, x)
    k8, ks, v8, vs = new._unpack()
    ref_nib, ref_scale = quantize_kv4(x)
    # [B, T, KV, Dh] reference against the unpacked [B, KV, S, Dh] layout.
    got = np.asarray(k8)[:, :, :T].transpose(0, 2, 1, 3)
    np.testing.assert_array_equal(got, np.asarray(ref_nib))
    np.testing.assert_allclose(
        np.asarray(ks)[:, :, :T].transpose(0, 2, 1),
        np.asarray(ref_scale), rtol=0, atol=0,
    )


def test_two_phase_write_merges_both_nibbles():
    """A chunk spanning an odd->even boundary lands both nibbles of shared
    bytes; a second chunk starting at an odd position RMWs the high nibble
    without clobbering the low one."""
    rng = np.random.default_rng(1)
    B, KV, Dh = 1, 1, 16
    cache = Int4KVCache.init(B, 16, KV, Dh)
    x1 = jnp.asarray(rng.standard_normal((B, 3, KV, Dh)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((B, 5, KV, Dh)), jnp.float32)
    cache = cache.update(x1, x1)          # tokens 0,1,2
    cache = cache.update(x2, x2)          # tokens 3..7 (3 shares byte 1 with 2)
    k8, ks, _, _ = cache._unpack()
    full = jnp.concatenate([x1, x2], axis=1)
    ref_nib, ref_scale = quantize_kv4(full)
    np.testing.assert_array_equal(
        np.asarray(k8)[:, :, :8].transpose(0, 2, 1, 3), np.asarray(ref_nib))
    np.testing.assert_allclose(
        np.asarray(ks)[:, :, :8].transpose(0, 2, 1), np.asarray(ref_scale))


@pytest.mark.parametrize("T", [1, 4])
def test_int4_kernel_matches_xla_oracle(T):
    """Pallas int4 flash kernel (interpret) == unpack + int8 XLA formulation
    on the same nibbles (f32 lanes: bitwise-comparable math, loose-ulp
    compare for the softmax chain)."""
    from protoquant_tpu.ops.attention import (
        int4_kv_attention,
        int8_kv_attention_xla,
    )

    rng = np.random.default_rng(2)
    B, KV, Dh, S, H = 2, 2, 32, 64, 4
    cache = Int4KVCache.init(B, S, KV, Dh)
    warm = jnp.asarray(rng.standard_normal((B, 10, KV, Dh)), jnp.float32)
    cache = cache.update(warm, warm)
    q = jnp.asarray(rng.standard_normal((B, T, H, Dh)), jnp.float32)
    step = jnp.asarray(rng.standard_normal((B, T, KV, Dh)), jnp.float32)
    lengths = cache.lengths
    new = cache.update(step, step)

    got = np.asarray(int4_kv_attention(
        q, new.kq, new.ks, new.vq, new.vs, lengths, interpret=True))
    k8, ks, v8, vs = new._unpack()
    want = np.asarray(int8_kv_attention_xla(q, k8, ks, v8, vs, lengths))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_cache_consistency_and_engine():
    """Scoring vs per-token int4-cached decode agree within int4 noise, and
    the engine serves kv_dtype=jnp.int4 end-to-end."""
    from protoquant_tpu.engine import Engine, EngineConfig

    model = LlamaModel(CFG, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    rng = np.random.default_rng(3)
    toks = jnp.asarray(rng.integers(1, 64, (1, 12)), jnp.int32)
    ref = np.asarray(model.apply(params, toks))

    caches = init_cache(CFG, 1, 32, kv_dtype=jnp.int4)
    assert isinstance(caches[0], Int4KVCache)
    outs = []
    for t in range(toks.shape[1]):
        logits, caches = model.apply(
            params, toks[:, t : t + 1], jnp.asarray([[t]], jnp.int32), caches)
        outs.append(np.asarray(logits)[:, 0])
    got = np.stack(outs, axis=1)
    np.testing.assert_allclose(got, ref, rtol=0.3, atol=0.3)
    agree = np.mean(np.argmax(got, -1) == np.argmax(ref, -1))
    assert agree >= 0.8, agree

    eng = Engine(model, params,
                 EngineConfig(max_batch_size=2, max_seq_len=64,
                              prefill_chunk=16, max_new_tokens=6),
                 kv_dtype=jnp.int4)
    rid = eng.add_request([1, 2, 3], 6)
    out = eng.run()[rid]
    assert len(out) == 6 and all(0 <= t < 64 for t in out)


def test_int4_kv_guards():
    """Windowed/softcap/sink models must refuse the int4 cache clearly."""
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, sliding_window=5,
    )
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    caches = init_cache(cfg, 1, 32, kv_dtype=jnp.int4)
    with pytest.raises(NotImplementedError, match="full-causal"):
        model.apply(params, jnp.ones((1, 1), jnp.int32),
                    jnp.zeros((1, 1), jnp.int32), caches)


def test_int4_scatter_kernel_matches_xla_update():
    """The in-place RMW scatter kernel (interpret mode) produces the same
    packed bytes + scales as the XLA two-phase merge for a decode token at
    even and odd positions."""
    from protoquant_tpu.models.kv_cache import quantize_kv4
    from protoquant_tpu.ops.kv_scatter import kv4_scatter_decode

    rng = np.random.default_rng(5)
    B, KV, Dh, S = 2, 2, 16, 16
    for fill in (4, 5):  # even and odd write positions
        cache = Int4KVCache.init(B, S, KV, Dh)
        warm = jnp.asarray(rng.standard_normal((B, fill, KV, Dh)), jnp.float32)
        cache = cache.update(warm, warm)
        tok = jnp.asarray(rng.standard_normal((B, 1, KV, Dh)), jnp.float32)
        ref = cache.update(tok, tok)  # XLA merge path (CPU backend)
        k4, ks_new = quantize_kv4(tok)
        v4, vs_new = quantize_kv4(tok)
        kq, ks, vq, vs = kv4_scatter_decode(
            cache.kq, cache.ks, cache.vq, cache.vs, cache.lengths,
            jnp.swapaxes(k4, 1, 2), jnp.swapaxes(ks_new, 1, 2),
            jnp.swapaxes(v4, 1, 2), jnp.swapaxes(vs_new, 1, 2),
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(kq), np.asarray(ref.kq))
        np.testing.assert_array_equal(np.asarray(vq), np.asarray(ref.vq))
        np.testing.assert_allclose(np.asarray(ks), np.asarray(ref.ks))
        np.testing.assert_allclose(np.asarray(vs), np.asarray(ref.vs))
