"""M4: int8 KV-cache + in-kernel-dequant attention."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protoquant_tpu.models.kv_cache import BF16KVCache, Int8KVCache, quantize_kv
from protoquant_tpu.ops.attention import int8_kv_attention, int8_kv_attention_ref


def rand(shape, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray((rng.standard_normal(shape) * scale).astype(np.float32))


def test_quantize_kv_roundtrip():
    x = rand((2, 5, 4, 64), seed=1, scale=2.0)
    q, s = quantize_kv(x)
    assert q.shape == x.shape and s.shape == (2, 5, 4)
    x_hat = q.astype(jnp.float32) * s[..., None]
    err = np.abs(np.asarray(x_hat - x))
    bound = np.asarray(s)[..., None] / 2 + 1e-8
    assert np.all(err <= bound)


@pytest.mark.parametrize("t_q", [1, 4])
def test_int8_attention_kernel_matches_ref(t_q):
    B, KV, G, S, Dh = 2, 2, 4, 128, 64
    H = KV * G
    rng = np.random.default_rng(2)
    q = rand((B, t_q, H, Dh), seed=3, scale=0.5)
    kq = jnp.asarray(rng.integers(-127, 128, (B, KV, S, Dh), dtype=np.int8))
    vq = jnp.asarray(rng.integers(-127, 128, (B, KV, S, Dh), dtype=np.int8))
    ks = jnp.asarray(rng.uniform(0.005, 0.02, (B, KV, S)).astype(np.float32))
    vs = jnp.asarray(rng.uniform(0.005, 0.02, (B, KV, S)).astype(np.float32))
    lengths = jnp.asarray([37, 80], jnp.int32)

    out = int8_kv_attention(q, kq, ks, vq, vs, lengths)
    ref = int8_kv_attention_ref(q, kq, ks, vq, vs, lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_int8_cache_update_and_attend_vs_bf16_cache():
    """Int8 cache attention ~= fp cache attention on the same stream."""
    B, KV, G, S, Dh, T = 2, 2, 2, 64, 32, 6
    H = KV * G
    c8 = Int8KVCache.init(B, S, KV, Dh)
    c16 = BF16KVCache.init(B, S, KV, Dh, jnp.float32)

    outs8, outs16 = [], []
    for step in range(3):
        q = rand((B, T, H, Dh), seed=10 + step, scale=0.5)
        k = rand((B, T, KV, Dh), seed=20 + step, scale=0.5)
        v = rand((B, T, KV, Dh), seed=30 + step, scale=0.5)
        o8, c8 = c8.update_and_attend(q, k, v)
        o16, c16 = c16.update_and_attend(q, k, v)
        outs8.append(np.asarray(o8))
        outs16.append(np.asarray(o16))

    np.testing.assert_array_equal(np.asarray(c8.lengths), [3 * T, 3 * T])
    for a, b in zip(outs8, outs16):
        cos = np.sum(a * b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > 0.995, cos


def test_int8_cache_per_slot_lengths():
    """Slots advance independently (continuous-batching invariant)."""
    B, KV, S, Dh, H = 3, 1, 32, 32, 2
    cache = Int8KVCache.init(B, S, KV, Dh)
    # Write 4 tokens to all slots, then reset slot 1.
    k = rand((B, 4, KV, Dh), seed=40)
    v = rand((B, 4, KV, Dh), seed=41)
    cache = cache.update(k, v)
    cache = cache.reset_slot(jnp.asarray(1))
    np.testing.assert_array_equal(np.asarray(cache.lengths), [4, 0, 4])

    # One more decode token on every slot; slot 1 writes at position 0.
    q = rand((B, 1, H, Dh), seed=42)
    k1 = rand((B, 1, KV, Dh), seed=43)
    v1 = rand((B, 1, KV, Dh), seed=44)
    out, cache = cache.update_and_attend(q, k1, v1)
    np.testing.assert_array_equal(np.asarray(cache.lengths), [5, 1, 5])
    assert np.all(np.isfinite(np.asarray(out)))

    # Slot 1's attention over its single token == plain value readout.
    v1_deq = np.asarray(cache.vq[1, :, 0].astype(jnp.float32) * cache.vs[1, :, 0, None])
    got = np.asarray(out)[1, 0]  # [H, Dh]; group=2 -> both heads read kv 0
    np.testing.assert_allclose(got[0], v1_deq[0], rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("s_window,t_q", [(1024, 1), (640, 1), (1024, 4)])
def test_int8_flash_attention_multiblock_matches_ref(s_window, t_q):
    """S-blocked online-softmax path: multiple S blocks per (b, head)
    program, including lengths that leave trailing blocks fully clamped
    (VERDICT round-1 item 2: the dense kernel must not need the whole
    window in VMEM)."""
    B, KV, G, Dh = 2, 2, 2, 64
    H = KV * G
    rng = np.random.default_rng(7)
    q = rand((B, t_q, H, Dh), seed=9, scale=0.5)
    kq = jnp.asarray(rng.integers(-127, 128, (B, KV, s_window, Dh), dtype=np.int8))
    vq = jnp.asarray(rng.integers(-127, 128, (B, KV, s_window, Dh), dtype=np.int8))
    ks = jnp.asarray(rng.uniform(0.005, 0.02, (B, KV, s_window)).astype(np.float32))
    vs = jnp.asarray(rng.uniform(0.005, 0.02, (B, KV, s_window)).astype(np.float32))
    # One slot deep into the window (spans blocks), one nearly empty (every
    # block but the first is clamped/dead).
    lengths = jnp.asarray([s_window - 3, 2], jnp.int32)

    out = int8_kv_attention(q, kq, ks, vq, vs, lengths)
    ref = int8_kv_attention_ref(q, kq, ks, vq, vs, lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_kv_scatter_decode_matches_xla_scatter():
    """The in-place Pallas decode scatter (ops/kv_scatter.py) is bit-exact
    vs the advanced-index XLA scatter, across block-edge positions."""
    from protoquant_tpu.ops.kv_scatter import kv_scatter_decode

    B, KV, S, Dh = 4, 8, 256, 32
    rng = np.random.default_rng(0)
    kq = jnp.asarray(rng.integers(-100, 100, (B, KV, S, Dh), dtype=np.int8))
    vq = jnp.asarray(rng.integers(-100, 100, (B, KV, S, Dh), dtype=np.int8))
    ks = jnp.asarray(rng.uniform(0.01, 1, (B, KV, S)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.01, 1, (B, KV, S)), jnp.float32)
    # Positions probing: 0, mid-block, last row, scale-block edges.
    lengths = jnp.asarray([0, 5, 255, 130], jnp.int32)
    k8 = jnp.asarray(rng.integers(-100, 100, (B, KV, 1, Dh), dtype=np.int8))
    v8 = jnp.asarray(rng.integers(-100, 100, (B, KV, 1, Dh), dtype=np.int8))
    ksn = jnp.asarray(rng.uniform(0.01, 1, (B, KV, 1)), jnp.float32)
    vsn = jnp.asarray(rng.uniform(0.01, 1, (B, KV, 1)), jnp.float32)

    kq2, ks2, vq2, vs2 = kv_scatter_decode(
        kq, ks, vq, vs, lengths, k8, ksn, v8, vsn, interpret=True
    )
    b_idx = jnp.arange(B)[:, None]
    s_idx = lengths[:, None]
    np.testing.assert_array_equal(
        np.asarray(kq2), np.asarray(kq.at[b_idx, :, s_idx].set(jnp.swapaxes(k8, 1, 2)))
    )
    np.testing.assert_array_equal(
        np.asarray(vq2), np.asarray(vq.at[b_idx, :, s_idx].set(jnp.swapaxes(v8, 1, 2)))
    )
    np.testing.assert_array_equal(
        np.asarray(ks2), np.asarray(ks.at[b_idx, :, s_idx].set(ksn[..., 0][:, None, :]))
    )
    np.testing.assert_array_equal(
        np.asarray(vs2), np.asarray(vs.at[b_idx, :, s_idx].set(vsn[..., 0][:, None, :]))
    )


def test_pallas_backend_decode_stream_matches_xla_backend():
    """Full decode stream through the pallas backend (in-place scatter +
    flash attend) matches the xla backend's outputs and cache contents."""
    from protoquant_tpu.models import kv_cache as kvmod

    B, KV, G, S, Dh, T = 2, 2, 2, 64, 32, 4
    H = KV * G
    k0 = rand((B, T, KV, Dh), seed=50)
    v0 = rand((B, T, KV, Dh), seed=51)

    def run(backend):
        prev = kvmod.ATTENTION_BACKEND
        kvmod.ATTENTION_BACKEND = backend
        try:
            c = Int8KVCache.init(B, S, KV, Dh)
            c = c.update(k0, v0)  # prefill via the shared XLA scatter
            outs = []
            for step in range(3):
                q = rand((B, 1, H, Dh), seed=60 + step, scale=0.5)
                k = rand((B, 1, KV, Dh), seed=70 + step, scale=0.5)
                v = rand((B, 1, KV, Dh), seed=80 + step, scale=0.5)
                o, c = c.update_and_attend(q, k, v)
                outs.append(np.asarray(o))
            return outs, c
        finally:
            kvmod.ATTENTION_BACKEND = prev

    outs_p, cache_p = run("pallas")
    outs_x, cache_x = run("xla")
    np.testing.assert_array_equal(np.asarray(cache_p.kq), np.asarray(cache_x.kq))
    np.testing.assert_array_equal(np.asarray(cache_p.vq), np.asarray(cache_x.vq))
    np.testing.assert_array_equal(np.asarray(cache_p.lengths), np.asarray(cache_x.lengths))
    for a, b in zip(outs_p, outs_x):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("kv,group", [(3, 1), (2, 8), (6, 2)])
def test_flash_head_blocking_odd_shapes(kv, group):
    """Head-blocked kernel across HB-divisor edge cases: odd KV (divisor
    search), deep GQA (TG = T*group rows), and partial blocking."""
    B, S, Dh, T = 2, 256, 64, 2
    H = kv * group
    rng = np.random.default_rng(11)
    q = rand((B, T, H, Dh), seed=12, scale=0.5)
    kq = jnp.asarray(rng.integers(-127, 128, (B, kv, S, Dh), dtype=np.int8))
    vq = jnp.asarray(rng.integers(-127, 128, (B, kv, S, Dh), dtype=np.int8))
    ks = jnp.asarray(rng.uniform(0.005, 0.02, (B, kv, S)).astype(np.float32))
    vs = jnp.asarray(rng.uniform(0.005, 0.02, (B, kv, S)).astype(np.float32))
    lengths = jnp.asarray([100, 253], jnp.int32)

    out = int8_kv_attention(q, kq, ks, vq, vs, lengths)
    ref = int8_kv_attention_ref(q, kq, ks, vq, vs, lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_kv_scatter_decode_drops_write_at_capacity():
    """A slot at lengths == S must drop the write (XLA scatter OOB
    semantics), not clobber the last block."""
    from protoquant_tpu.ops.kv_scatter import kv_scatter_decode

    B, KV, S, Dh = 2, 2, 128, 32
    rng = np.random.default_rng(2)
    kq = jnp.asarray(rng.integers(-100, 100, (B, KV, S, Dh), dtype=np.int8))
    vq = jnp.asarray(rng.integers(-100, 100, (B, KV, S, Dh), dtype=np.int8))
    ks = jnp.asarray(rng.uniform(0.01, 1, (B, KV, S)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.01, 1, (B, KV, S)), jnp.float32)
    lengths = jnp.asarray([S, 3], jnp.int32)  # slot 0 at capacity
    k8 = jnp.asarray(rng.integers(-100, 100, (B, KV, 1, Dh), dtype=np.int8))
    v8 = jnp.asarray(rng.integers(-100, 100, (B, KV, 1, Dh), dtype=np.int8))
    ksn = jnp.asarray(rng.uniform(0.01, 1, (B, KV, 1)), jnp.float32)
    vsn = jnp.asarray(rng.uniform(0.01, 1, (B, KV, 1)), jnp.float32)

    kq2, ks2, vq2, vs2 = kv_scatter_decode(
        kq, ks, vq, vs, lengths, k8, ksn, v8, vsn, interpret=True
    )
    # Slot 0: untouched everywhere.
    np.testing.assert_array_equal(np.asarray(kq2[0]), np.asarray(kq[0]))
    np.testing.assert_array_equal(np.asarray(ks2[0]), np.asarray(ks[0]))
    np.testing.assert_array_equal(np.asarray(vs2[0]), np.asarray(vs[0]))
    # Slot 1: written at position 3.
    np.testing.assert_array_equal(np.asarray(kq2[1, :, 3]), np.asarray(k8[1, :, 0]))


@pytest.mark.parametrize(
    "variant,t_q",
    [
        # Sliding window entirely inside the last S-block (lo-block skipping
        # exercised on the long slot), decode and chunked-prefill queries.
        ("window", 1),
        ("window", 4),
        # Window smaller than the query chunk: rows in one program have
        # DISJOINT windows, exercising the masked-row guard in the online
        # softmax (a block can be fully masked for row t=0 while live for
        # t=3).
        ("tiny_window", 4),
        # Gemma query scaling / Gemma-2 softcap + window + scaling combined.
        ("scale", 1),
        ("gemma2", 4),
        # GPT-OSS learned sinks via online-softmax initial state.
        ("sinks", 1),
        ("sinks", 4),
        # ALiBi per-row slope biases (BLOOM/MPT; round-4 in-kernel tier).
        ("alibi", 1),
        ("alibi", 4),
    ],
)
def test_int8_flash_attention_variants_match_ref(variant, t_q):
    """The flash kernel's window/scale/softcap/sink variants are exact vs
    the XLA formulation (which is itself HF-parity-tested end to end).
    S=1024 -> two 512-blocks, so windowed cases cross block boundaries."""
    B, KV, G, S, Dh = 2, 2, 2, 1024, 64
    H = KV * G
    rng = np.random.default_rng(11)
    q = rand((B, t_q, H, Dh), seed=12, scale=0.5)
    kq = jnp.asarray(rng.integers(-127, 128, (B, KV, S, Dh), dtype=np.int8))
    vq = jnp.asarray(rng.integers(-127, 128, (B, KV, S, Dh), dtype=np.int8))
    ks = jnp.asarray(rng.uniform(0.005, 0.02, (B, KV, S)).astype(np.float32))
    vs = jnp.asarray(rng.uniform(0.005, 0.02, (B, KV, S)).astype(np.float32))
    # One slot deep into block 1 (window start also in block 1 for
    # window=200), one short slot whose window reaches position 0.
    lengths = jnp.asarray([S - 30, 70], jnp.int32)

    kw = {}
    if variant == "window":
        kw["window"] = 200
    elif variant == "tiny_window":
        kw["window"] = 2  # narrower than the t_q=4 chunk
    elif variant == "scale":
        kw["scale"] = 0.25
    elif variant == "gemma2":
        kw.update(window=300, scale=0.125, softcap=30.0)
    elif variant == "sinks":
        kw["sink_logits"] = jnp.asarray(
            rng.uniform(-2.0, 2.0, (H,)).astype(np.float32)
        )
    elif variant == "alibi":
        from protoquant_tpu.models.llama import alibi_slopes

        kw["alibi_slopes"] = jnp.asarray(alibi_slopes(H))

    out = int8_kv_attention(q, kq, ks, vq, vs, lengths, **kw)
    ref = int8_kv_attention_ref(q, kq, ks, vq, vs, lengths, **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("sinks,t_q", [(0, 1), (0, 4), (4, 1), (4, 4)])
def test_int8_flash_attention_ring_positions_match_ref(sinks, t_q):
    """Ring-cache variant: per-column absolute positions (scattered by the
    ring modulus, negative = never written) drive the mask; StreamingLLM
    sink positions stay visible past the window."""
    B, KV, G, C, Dh, W = 2, 2, 2, 256, 64, 128
    H = KV * G
    rng = np.random.default_rng(21)
    q = rand((B, t_q, H, Dh), seed=22, scale=0.5)
    kq = jnp.asarray(rng.integers(-127, 128, (B, KV, C, Dh), dtype=np.int8))
    vq = jnp.asarray(rng.integers(-127, 128, (B, KV, C, Dh), dtype=np.int8))
    ks = jnp.asarray(rng.uniform(0.005, 0.02, (B, KV, C)).astype(np.float32))
    vs = jnp.asarray(rng.uniform(0.005, 0.02, (B, KV, C)).astype(np.float32))
    # Slot 0: long stream (ring wrapped many times); slot 1: short (most
    # columns never written -> negative positions).
    lengths = jnp.asarray([1000, 30], jnp.int32)
    L = lengths[:, None] + t_q
    c = jnp.arange(C)[None, :]
    if sinks == 0:
        k_pos = (L - 1) - ((L - 1 - c) % C)
    else:
        R = C - sinks
        m = c - sinks
        rot = (L - 1) - ((L - 1 - sinks - m) % R)
        rot = jnp.where(rot >= sinks, rot, -1)
        k_pos = jnp.where(c < sinks, jnp.where(c < L, c, -1), rot)

    kw = dict(window=W, k_positions=k_pos, sinks=sinks)
    out = int8_kv_attention(q, kq, ks, vq, vs, lengths, **kw)
    ref = int8_kv_attention_ref(q, kq, ks, vq, vs, lengths, **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-4, atol=3e-4)

    # ALiBi x ring (round 5, VERDICT r4 item 4): the bias reads the same
    # per-column absolute positions as the mask, so the scattered ring
    # columns change nothing — exact vs the XLA formulation.
    from protoquant_tpu.models.llama import alibi_slopes

    kw["alibi_slopes"] = jnp.asarray(alibi_slopes(H))
    out_a = int8_kv_attention(q, kq, ks, vq, vs, lengths, **kw)
    ref_a = int8_kv_attention_ref(q, kq, ks, vq, vs, lengths, **kw)
    np.testing.assert_allclose(
        np.asarray(out_a), np.asarray(ref_a), rtol=3e-4, atol=3e-4)
    # Control: the bias actually changed the output.
    assert np.abs(np.asarray(out_a) - np.asarray(out)).max() > 1e-4
