"""Paged INT8 KV cache + native page allocator + paged engine."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protoquant_tpu.engine import Engine, EngineConfig
from protoquant_tpu.engine.paged_kv import PagedInt8KVCache
from protoquant_tpu.models import LlamaModel, greedy_generate
from protoquant_tpu.models.kv_cache import Int8KVCache
from protoquant_tpu.native import PageAllocator
from protoquant_tpu.utils.config import ModelConfig

# Subsystem matrix: full-coverage tier (fast tier: -m 'not slow').
pytestmark = pytest.mark.slow


def rand(shape, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray((rng.standard_normal(shape) * scale).astype(np.float32))


# ---------------------------------------------------------------------------
# Native allocator
# ---------------------------------------------------------------------------


def test_page_allocator_basic():
    a = PageAllocator(8)
    assert a.num_free == 8
    p = a.alloc(5)
    assert len(p) == 5 and len(set(p)) == 5 and a.num_free == 3
    assert a.alloc(4) is None  # all-or-nothing
    assert a.num_free == 3
    a.free(p)
    assert a.num_free == 8


def test_page_allocator_double_free_guarded():
    a = PageAllocator(4)
    p = a.alloc(2)
    a.free(p)
    a.free(p)  # must not corrupt the free list
    assert a.num_free == 4
    q = a.alloc(4)
    assert sorted(q) == list(range(4))


# ---------------------------------------------------------------------------
# Paged cache vs dense cache (same stream => ~same attention output)
# ---------------------------------------------------------------------------


def test_paged_matches_dense_int8_cache():
    B, KV, Dh, H, ps = 2, 2, 32, 4, 8
    max_pages = 4  # window = 32 tokens
    dense = Int8KVCache.init(B, max_pages * ps, KV, Dh)
    paged = PagedInt8KVCache.init(
        B, num_pages=B * max_pages, max_pages_per_seq=max_pages,
        page_size=ps, kv_heads=KV, head_dim=Dh,
    )
    # Map page chains: slot 0 -> [3,1,7,2], slot 1 -> [0,4,5,6] (scrambled on
    # purpose: correctness must not depend on contiguity).
    paged = paged.map_slot(0, [3, 1, 7, 2])
    paged = paged.map_slot(1, [0, 4, 5, 6])

    for step, t in enumerate([5, 1, 9, 1]):
        q = rand((B, t, H, Dh), seed=step, scale=0.5)
        k = rand((B, t, KV, Dh), seed=10 + step, scale=0.5)
        v = rand((B, t, KV, Dh), seed=20 + step, scale=0.5)
        o_d, dense = dense.update_and_attend(q, k, v)
        o_p, paged = paged.update_and_attend(q, k, v)
        np.testing.assert_allclose(
            np.asarray(o_d), np.asarray(o_p), rtol=2e-4, atol=2e-4
        )
    np.testing.assert_array_equal(np.asarray(paged.lengths), np.asarray(dense.lengths))


def test_paged_slot_views():
    B, KV, Dh, ps = 3, 1, 32, 8
    paged = PagedInt8KVCache.init(B, 12, 4, ps, KV, Dh)
    paged = paged.map_slot(1, [2, 3])
    view = paged.slot_view(jnp.asarray(1))
    assert view.page_table.shape == (1, 4)
    assert view.kq.shape == paged.kq.shape  # pools shared
    np.testing.assert_array_equal(np.asarray(view.page_table[0, :2]), [2, 3])

    # Mutate through the view, merge back.
    k = rand((1, 4, KV, Dh), seed=1)
    v = rand((1, 4, KV, Dh), seed=2)
    view2 = view.update(k, v)
    merged = paged.merge_slot(view2, jnp.asarray(1))
    assert int(merged.lengths[1]) == 4 and int(merged.lengths[0]) == 0


# ---------------------------------------------------------------------------
# Paged engine end-to-end
# ---------------------------------------------------------------------------

CFG = ModelConfig(
    vocab_size=64,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=128,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = LlamaModel(CFG, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    return model, params


def test_paged_engine_matches_generate(model_and_params):
    model, params = model_and_params
    cfg = EngineConfig(
        max_batch_size=4, max_seq_len=64, page_size=16, prefill_chunk=16,
        max_new_tokens=8, temperature=0.0,
    )
    eng = Engine(model, params, cfg, kv_layout="paged")
    assert eng.allocator is not None and eng.allocator.native

    prompts = [[3, 17, 5, 9], [1, 2, 3], [7, 8, 9, 10, 11]]
    rids = [eng.add_request(p, 6) for p in prompts]
    outs = eng.run()

    for rid, p in zip(rids, prompts):
        # int8 KV introduces small noise vs the fp reference; require the
        # stream to start identically (first tokens dominated by prompt).
        ref = list(
            np.asarray(
                greedy_generate(model, params, jnp.asarray([p], jnp.int32), 6, 64,
                                kv_dtype=jnp.int8)
            )[0]
        )
        assert outs[rid] == ref, (outs[rid], ref)
    # All pages returned after drain.
    assert eng.allocator.num_free == eng.allocator.num_pages


def test_paged_engine_pool_exhaustion_queues(model_and_params):
    model, params = model_and_params
    cfg = EngineConfig(
        max_batch_size=4, max_seq_len=32, page_size=16, prefill_chunk=16,
        max_new_tokens=4, temperature=0.0,
    )
    eng = Engine(model, params, cfg, kv_layout="paged")
    # Pool = 4*32/16 = 8 pages; each request needs 2 -> 5th request waits.
    rids = [eng.add_request([1, 2, 3], 4) for _ in range(6)]
    outs = eng.run()
    assert set(rids) == set(outs.keys())
    assert all(len(o) == 4 for o in outs.values())


def test_paged_kernel_matches_gather_path():
    """The scalar-prefetch paged kernel (decode) == the gather+einsum path,
    including scrambled page chains and differing slot lengths."""
    from protoquant_tpu.models import kv_cache as kvmod
    from protoquant_tpu.ops.paged_attention import paged_int8_attention

    B, KV, Dh, H, ps = 2, 2, 32, 4, 8
    max_pages = 4
    paged = PagedInt8KVCache.init(B, 2 * B * max_pages, max_pages, ps, KV, Dh)
    paged = paged.map_slot(0, [5, 1, 7, 2])
    paged = paged.map_slot(1, [0, 4, 6, 3])

    # Fill with a prefill chunk of different lengths per slot, then decode.
    k = rand((B, 7, KV, Dh), seed=1, scale=0.5)
    v = rand((B, 7, KV, Dh), seed=2, scale=0.5)
    paged = paged.update(k, v, advance=jnp.asarray([7, 5], jnp.int32))

    q = rand((B, 1, H, Dh), seed=3, scale=0.5)
    k1 = rand((B, 1, KV, Dh), seed=4, scale=0.5)
    v1 = rand((B, 1, KV, Dh), seed=5, scale=0.5)

    new = paged.update(k1, v1)
    kq, ks, vq, vs = new._gather_window()
    from protoquant_tpu.ops.attention import int8_kv_attention_xla

    ref = int8_kv_attention_xla(q, kq, ks, vq, vs, paged.lengths)
    got = paged_int8_attention(
        q, new.kq, new.ks, new.vq, new.vs, new.page_table, paged.lengths
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=2e-4, atol=2e-4
    )


def test_paged_kernel_alibi_matches_gather_path():
    """In-kernel ALiBi (round 4): the page-walk kernel with slope rows ==
    the gather+XLA oracle's ALiBi formulation (BLOOM/MPT on paged KV)."""
    from protoquant_tpu.models.llama import alibi_slopes
    from protoquant_tpu.ops.attention import int8_kv_attention_xla
    from protoquant_tpu.ops.paged_attention import paged_int8_attention

    B, KV, Dh, H, ps = 2, 2, 32, 4, 8
    max_pages = 4
    paged = PagedInt8KVCache.init(B, 2 * B * max_pages, max_pages, ps, KV, Dh)
    paged = paged.map_slot(0, [5, 1, 7, 2])
    paged = paged.map_slot(1, [0, 4, 6, 3])
    k = rand((B, 7, KV, Dh), seed=1, scale=0.5)
    v = rand((B, 7, KV, Dh), seed=2, scale=0.5)
    paged = paged.update(k, v, advance=jnp.asarray([7, 5], jnp.int32))

    q = rand((B, 1, H, Dh), seed=3, scale=0.5)
    k1 = rand((B, 1, KV, Dh), seed=4, scale=0.5)
    v1 = rand((B, 1, KV, Dh), seed=5, scale=0.5)
    slopes = jnp.asarray(alibi_slopes(H))

    new = paged.update(k1, v1)
    kq, ks, vq, vs = new._gather_window()
    ref = int8_kv_attention_xla(
        q, kq, ks, vq, vs, paged.lengths, alibi_slopes=slopes
    )
    got = paged_int8_attention(
        q, new.kq, new.ks, new.vq, new.vs, new.page_table, paged.lengths,
        alibi_slopes=slopes,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=2e-4, atol=2e-4,
    )


def test_paged_engine_with_pallas_kernel(model_and_params):
    """Engine end-to-end with the paged kernel backend enabled."""
    from protoquant_tpu.models import kv_cache as kvmod

    model, params = model_and_params
    cfg = EngineConfig(
        max_batch_size=3, max_seq_len=64, page_size=16, prefill_chunk=16,
        max_new_tokens=6, temperature=0.0,
    )
    prompts = [[3, 17, 5, 9], [1, 2, 3]]

    eng_ref = Engine(model, params, cfg, kv_layout="paged")
    rids = [eng_ref.add_request(p, 6) for p in prompts]
    ref_outs = eng_ref.run()

    prev = kvmod.ATTENTION_BACKEND
    try:
        kvmod.ATTENTION_BACKEND = "pallas"
        eng = Engine(model, params, cfg, kv_layout="paged")
        rids2 = [eng.add_request(p, 6) for p in prompts]
        outs = eng.run()
    finally:
        kvmod.ATTENTION_BACKEND = prev
    for ra, rb in zip(rids, rids2):
        assert ref_outs[ra] == outs[rb], (ref_outs[ra], outs[rb])


def test_paged_no_stale_page_corruption(model_and_params):
    """A finished request's slot must not scribble into pages reallocated to
    a later request: retire A, admit B (reusing A's pages) while other slots
    keep decoding; B's output must match a fresh engine."""
    model, params = model_and_params
    cfg = EngineConfig(
        max_batch_size=2, max_seq_len=32, page_size=16, prefill_chunk=16,
        max_new_tokens=12, temperature=0.0,
    )
    long_prompt = [7, 8, 9, 10, 11]
    short_prompt = [1, 2, 3]
    late_prompt = [4, 5, 6, 7]

    eng = Engine(model, params, cfg, kv_layout="paged")
    r_long = eng.add_request(long_prompt, 12)   # keeps decoding throughout
    r_short = eng.add_request(short_prompt, 2)  # finishes fast, frees pages
    while not eng.slot_req[0] or not any(
        r.rid == r_short and r.done for r in eng.finished
    ):
        eng.step()
        if not eng.has_work():
            break
    # B is admitted into the freed slot/pages while r_long's (and the
    # retired slot's) decode steps continue.
    r_late = eng.add_request(late_prompt, 8)
    outs = eng.run()

    ref_eng = Engine(model, params, cfg, kv_layout="paged")
    rr = ref_eng.add_request(late_prompt, 8)
    ref = ref_eng.run()[rr]
    assert outs[r_late] == ref, (outs[r_late], ref)

    # And the reserved trash page really is outside the allocator's pool.
    assert eng.allocator.num_pages == len(eng.caches[0].kq) - 1


def test_paged_prefill_pad_overflow_goes_to_trash(model_and_params):
    """Prefill pad tokens past the window (bucket > max_seq remainder) must
    not clamp into the slot's own last live page."""
    model, params = model_and_params
    cfg = EngineConfig(
        max_batch_size=2, max_seq_len=48, page_size=16, prefill_chunk=64,
        max_new_tokens=4, temperature=0.0,
    )
    # prompt 44 + 4 new = 48 == max_seq; single chunk bucket = 64 > 48, so
    # pad positions 44..63 overflow the 48-token window.
    rng = np.random.default_rng(12)
    prompt = list(map(int, rng.integers(1, 64, 44)))
    eng = Engine(model, params, cfg, kv_layout="paged")
    rid = eng.add_request(prompt, 4)
    out = eng.run()[rid]

    ref = list(
        np.asarray(
            greedy_generate(model, params, jnp.asarray([prompt], jnp.int32), 4, 48,
                            kv_dtype=jnp.int8)
        )[0]
    )
    assert out == ref, (out, ref)


def test_paged_window_bucketing_crosses_boundaries(model_and_params):
    """The decode-tick page-table slice (window bucketing) must traverse
    several power-of-2 buckets as contexts grow, stay exact, and restore the
    full-width table between ticks."""
    model, params = model_and_params
    cfg = EngineConfig(
        max_batch_size=2, max_seq_len=64, page_size=4, prefill_chunk=16,
        max_new_tokens=14, temperature=0.0,
    )
    eng = Engine(model, params, cfg, kv_layout="paged")
    used = []
    orig = eng._paged_window_pages
    eng._paged_window_pages = lambda n: used.append(orig(n)) or used[-1]

    prompts = [[3, 17, 5, 9, 2], [1, 2, 3]]
    rids = [eng.add_request(p, 14) for p in prompts]
    outs = eng.run()

    full = 64 // 4
    assert len(set(used)) >= 2, used  # crossed at least one bucket boundary
    assert max(used) < full  # never needed the full window for these lengths
    assert all(c.page_table.shape[1] == full for c in eng.caches)
    for rid, p in zip(rids, prompts):
        ref = list(
            np.asarray(
                greedy_generate(model, params, jnp.asarray([p], jnp.int32), 14,
                                64, kv_dtype=jnp.int8)
            )[0]
        )
        assert outs[rid] == ref, (outs[rid], ref)


def test_paged_kv_scatter_decode_matches_xla_scatter():
    """The in-place paged Pallas scatter (ops/kv_scatter.py) is bit-exact vs
    the advanced-index XLA scatter, including trash-page routing for
    unmapped slots."""
    from protoquant_tpu.ops.kv_scatter import paged_kv_scatter_decode

    P, KV, ps, Dh, B, width = 7, 4, 16, 32, 4, 3
    rng = np.random.default_rng(1)
    kq = jnp.asarray(rng.integers(-100, 100, (P, KV, ps, Dh), dtype=np.int8))
    vq = jnp.asarray(rng.integers(-100, 100, (P, KV, ps, Dh), dtype=np.int8))
    ks = jnp.asarray(rng.uniform(0.01, 1, (P, KV, 1, ps)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.01, 1, (P, KV, 1, ps)), jnp.float32)
    # Slot 0: page 0 off 0; slot 1: page 4 off 15 (page edge); slot 2:
    # unmapped (-1) -> trash; slot 3: page 2, second table entry.
    page_table = jnp.asarray(
        [[0, -1, -1], [4, -1, -1], [-1, -1, -1], [1, 2, -1]], jnp.int32
    )
    lengths = jnp.asarray([0, 15, 5, ps + 3], jnp.int32)
    k8 = jnp.asarray(rng.integers(-100, 100, (B, KV, 1, Dh), dtype=np.int8))
    v8 = jnp.asarray(rng.integers(-100, 100, (B, KV, 1, Dh), dtype=np.int8))
    ksn = jnp.asarray(rng.uniform(0.01, 1, (B, KV, 1)), jnp.float32)
    vsn = jnp.asarray(rng.uniform(0.01, 1, (B, KV, 1)), jnp.float32)

    kq2, ks2, vq2, vs2 = paged_kv_scatter_decode(
        kq, ks, vq, vs, page_table, lengths, k8, ksn, v8, vsn, interpret=True
    )

    # XLA reference (PagedInt8KVCache.update's formulation, T=1).
    pos = lengths[:, None]
    page_idx = pos // ps
    page = jnp.take_along_axis(page_table, jnp.minimum(page_idx, width - 1), axis=1)
    page = jnp.where((page < 0) | (page_idx >= width), P - 1, page)
    off = pos % ps
    kqr = kq.at[page, :, off].set(jnp.swapaxes(k8, 1, 2))
    vqr = vq.at[page, :, off].set(jnp.swapaxes(v8, 1, 2))
    ksr = ks.at[page, :, 0, off].set(jnp.swapaxes(ksn, 1, 2)[:, 0][:, None, :])
    vsr = vs.at[page, :, 0, off].set(jnp.swapaxes(vsn, 1, 2)[:, 0][:, None, :])
    np.testing.assert_array_equal(np.asarray(kq2), np.asarray(kqr))
    np.testing.assert_array_equal(np.asarray(vq2), np.asarray(vqr))
    np.testing.assert_array_equal(np.asarray(ks2), np.asarray(ksr))
    np.testing.assert_array_equal(np.asarray(vs2), np.asarray(vsr))


def test_paged_rejects_non_int8_kv_dtype():
    """kv_dtype != int8 with the paged layout was silently ignored (int8
    pages served anyway) — must be an explicit refusal."""
    import pytest

    from protoquant_tpu.engine import Engine, EngineConfig
    from protoquant_tpu.models import LlamaModel
    from protoquant_tpu.utils.config import ModelConfig

    cfg = ModelConfig(vocab_size=64, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=64)
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=64, page_size=16)
    with pytest.raises(ValueError, match="int8-only"):
        Engine(model, params, ecfg, kv_dtype=jnp.int4, kv_layout="paged")
