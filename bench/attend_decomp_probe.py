"""Decompose decode int8 attention cost inside a scan (hoist-proof).

Each case mutates ONE cache element per iteration (measured free) so XLA
cannot hoist the cache reads out of the loop, then touches only the listed
component. Two-length differencing cancels tunnel RTT.

Cases:
  mutate_only    — floor (scatter of 1 elem + carry)
  k_dot          — scores einsum only (reads kq 64MB)
  v_dot          — pv einsum only with fixed probs (reads vq 64MB)
  k_dot_f32      — scores with f32 lanes
  k_dot_s32      — scores as native s8 x s8 -> s32 (q quantized per-head)
  full           — scores+mask+softmax+pv (product math, reads both)
  full_s32       — full with both dots s8 x s8 -> s32
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

V5E_HBM_GBS = 819.0
NEG_INF = -1e30


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    B, KV, S, Dh, T = 8, 32, 2048, 128, 1
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, T, KV, Dh)), jnp.bfloat16)
    lengths = jnp.full((B,), S - 2, jnp.int32)
    scale = Dh**-0.5

    kq0 = jnp.asarray(rng.integers(-100, 100, (B, KV, S, Dh), dtype=np.int8))
    vq0 = jnp.asarray(rng.integers(-100, 100, (B, KV, S, Dh), dtype=np.int8))
    ks0 = jnp.asarray(rng.uniform(0.01, 0.03, (B, KV, S)), jnp.float32)
    vs0 = jnp.asarray(rng.uniform(0.01, 0.03, (B, KV, S)), jnp.float32)

    @jax.jit
    def _fresh(salt):
        # Device-side: a salted copy per timed call (donation consumes the
        # carry; host->device transfer per call would swamp the timing).
        d = (salt % 3).astype(jnp.int8)
        return kq0 + d, ks0, vq0 - d, vs0

    def init(salt=0):
        c = _fresh(jnp.int32(salt))
        jax.block_until_ready(c)
        return c

    probs_fixed = jnp.asarray(rng.uniform(0, 1, (B, KV, T, S)), jnp.bfloat16)

    def mutate(c, i):
        kq, ks, vq, vs = c
        kq = jax.lax.dynamic_update_slice(
            kq, (i % 5).astype(jnp.int8).reshape(1, 1, 1, 1), (0, 0, 0, 0)
        )
        vq = jax.lax.dynamic_update_slice(
            vq, (i % 3).astype(jnp.int8).reshape(1, 1, 1, 1), (0, 0, 0, 0)
        )
        return (kq, ks, vq, vs)

    def scores_bf16(qh, kq, ks):
        s = jnp.einsum("btkd,bksd->bkts", qh.astype(jnp.bfloat16),
                       kq.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        return s * ks[:, :, None, :]

    def scores_f32(qh, kq, ks):
        s = jnp.einsum("btkd,bksd->bkts", qh.astype(jnp.float32),
                       kq.astype(jnp.float32), preferred_element_type=jnp.float32)
        return s * ks[:, :, None, :]

    def quant_q(qh):  # per (b,t,k) int8 quant of q
        m = jnp.max(jnp.abs(qh), axis=-1, keepdims=True)
        s = jnp.maximum(m, 1e-6) / 127.0
        q8 = jnp.clip(jnp.round(qh / s), -127, 127).astype(jnp.int8)
        return q8, s[..., 0]

    def scores_s32(qh, kq, ks):
        q8, qs = quant_q(qh.astype(jnp.float32))
        s = jnp.einsum("btkd,bksd->bkts", q8, kq,
                       preferred_element_type=jnp.int32)
        return s.astype(jnp.float32) * (qs[..., None].transpose(0, 2, 1, 3) * ks[:, :, None, :])

    def softmax_mask(scores):
        s_pos = jnp.arange(S)
        t_pos = lengths[:, None] + jnp.arange(T)[None, :]
        mask = s_pos[None, None, None, :] <= t_pos[:, None, :, None]
        return jax.nn.softmax(jnp.where(mask, scores, NEG_INF), axis=-1)

    qh0 = (q.astype(jnp.float32) * scale)

    def case_mutate(c, i):
        c = mutate(c, i)
        return c, c[0][0, 0, 0, 0].astype(jnp.float32) + c[2][0, 0, 0, 0].astype(jnp.float32)

    def case_k_dot(c, i):
        c = mutate(c, i)
        kq, ks, vq, vs = c
        s = scores_bf16(qh0, kq, ks)
        return c, jnp.abs(s).sum()

    def case_k_dot_f32(c, i):
        c = mutate(c, i)
        kq, ks, vq, vs = c
        s = scores_f32(qh0, kq, ks)
        return c, jnp.abs(s).sum()

    def case_k_dot_s32(c, i):
        c = mutate(c, i)
        kq, ks, vq, vs = c
        s = scores_s32(qh0, kq, ks)
        return c, jnp.abs(s).sum()

    def case_v_dot(c, i):
        c = mutate(c, i)
        kq, ks, vq, vs = c
        pv = (probs_fixed * vs[:, :, None, :]).astype(jnp.bfloat16)
        out = jnp.einsum("bkts,bksd->btkd", pv, vq.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return c, jnp.abs(out).sum()

    def case_v_dot_s32(c, i):
        c = mutate(c, i)
        kq, ks, vq, vs = c
        p8, ps = quant_q(probs_fixed.astype(jnp.float32))
        out = jnp.einsum("bkts,bksd->btkd", p8, vq, preferred_element_type=jnp.int32)
        out = out.astype(jnp.float32) * ps.transpose(0, 2, 1)[..., None]
        return c, jnp.abs(out).sum()

    def case_full(c, i):
        c = mutate(c, i)
        kq, ks, vq, vs = c
        p = softmax_mask(scores_bf16(qh0, kq, ks))
        pv = (p * vs[:, :, None, :]).astype(jnp.bfloat16)
        out = jnp.einsum("bkts,bksd->btkd", pv, vq.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return c, jnp.abs(out).sum()

    def case_full_s32(c, i):
        c = mutate(c, i)
        kq, ks, vq, vs = c
        p = softmax_mask(scores_s32(qh0, kq, ks))
        p8, ps = quant_q(p)
        out = jnp.einsum("bkts,bksd->btkd", p8, vq, preferred_element_type=jnp.int32)
        out = out.astype(jnp.float32) * (ps.transpose(0, 2, 1)[..., None]) * 1.0
        out = out * 1.0  # vs folded into ps path omitted; timing-only
        return c, jnp.abs(out).sum()

    # bf16 references under the same hoist-proof harness: is 0.6 frac an
    # int8-specific DMA penalty or the pattern's true ceiling?
    kb0 = (kq0.astype(jnp.float32) * ks0[..., None]).astype(jnp.bfloat16)
    vb0 = (vq0.astype(jnp.float32) * vs0[..., None]).astype(jnp.bfloat16)

    def case_k_dot_bf16(c, i):
        c = mutate(c, i)
        kb = jax.lax.dynamic_update_slice(
            kb0, (i % 5).astype(jnp.bfloat16).reshape(1, 1, 1, 1), (0, 0, 0, 0)
        )
        s = jnp.einsum("btkd,bksd->bkts", qh0.astype(jnp.bfloat16), kb,
                       preferred_element_type=jnp.float32)
        return c, jnp.abs(s).sum()

    def case_v_dot_bf16(c, i):
        c = mutate(c, i)
        vb = jax.lax.dynamic_update_slice(
            vb0, (i % 5).astype(jnp.bfloat16).reshape(1, 1, 1, 1), (0, 0, 0, 0)
        )
        out = jnp.einsum("bkts,bksd->btkd", probs_fixed, vb,
                         preferred_element_type=jnp.float32)
        return c, jnp.abs(out).sum()

    # Raw-bandwidth read: same arrays bitcast to s32 (4x wider elements),
    # reduced. If this hits ~1.0 frac, narrow int8 lanes are the issue.
    def case_k_sum_s32cast(c, i):
        c = mutate(c, i)
        kq = c[0]
        w = jax.lax.bitcast_convert_type(
            kq.reshape(B, KV, S, Dh // 4, 4), jnp.int32
        )
        return c, jnp.sum(w, dtype=jnp.int32).astype(jnp.float32)

    def case_k_sum_s8(c, i):
        c = mutate(c, i)
        return c, jnp.sum(c[0], dtype=jnp.int32).astype(jnp.float32)

    from protoquant_tpu.ops.attention import int8_kv_attention

    def case_pallas_flash(c, i):
        c = mutate(c, i)
        kq, ks, vq, vs = c
        out = int8_kv_attention(q, kq, ks, vq, vs, lengths, interpret=False)
        return c, jnp.abs(out.astype(jnp.float32)).sum()

    one_side = B * KV * S * Dh + 4 * B * KV * S
    one_side_bf = 2 * B * KV * S * Dh
    both = 2 * B * KV * S * Dh + 8 * B * KV * S
    cases = [
        ("mutate_only", case_mutate, 0),
        ("k_dot", case_k_dot, one_side),
        ("k_dot_f32", case_k_dot_f32, one_side),
        ("k_dot_s32", case_k_dot_s32, one_side),
        ("v_dot", case_v_dot, one_side),
        ("v_dot_s32", case_v_dot_s32, one_side),
        ("full", case_full, both),
        ("full_s32", case_full_s32, both),
        ("k_dot_bf16", case_k_dot_bf16, one_side_bf),
        ("v_dot_bf16", case_v_dot_bf16, one_side_bf),
        ("k_sum_s8", case_k_sum_s8, B * KV * S * Dh),
        ("pallas_flash", case_pallas_flash, both),
    ]
    if os.environ.get("ONLY"):
        names = set(os.environ["ONLY"].split(","))
        cases = [c for c in cases if c[0] in names]

    def time_case(name, body_fn, nbytes):
        def make_run(n):
            @functools.partial(jax.jit, donate_argnums=(0,))
            def run(carry, salt):
                def body(c, i):
                    return body_fn(c, i + salt)

                c, accs = jax.lax.scan(body, carry, jnp.arange(n))
                return jnp.sum(accs)

            return run

        lo, hi = 128, 640
        run_lo, run_hi = make_run(lo), make_run(hi)
        float(run_lo(init(1), jnp.int32(1)))
        float(run_hi(init(2), jnp.int32(1)))
        best_lo = best_hi = float("inf")
        for j in range(2, 6):
            c = init(j)
            t0 = time.perf_counter()
            float(run_lo(c, jnp.int32(j * 1009)))
            best_lo = min(best_lo, time.perf_counter() - t0)
            c = init(j + 17)
            t0 = time.perf_counter()
            float(run_hi(c, jnp.int32(j * 2027)))
            best_hi = min(best_hi, time.perf_counter() - t0)
        dt = max(best_hi - best_lo, 1e-9) / (hi - lo)
        rec = {"case": name, "us": round(dt * 1e6, 1)}
        if nbytes:
            rec["gbs"] = round(nbytes / dt / 1e9, 1)
            rec["hbm_frac"] = round(nbytes / dt / 1e9 / V5E_HBM_GBS, 3)
        print(json.dumps(rec), flush=True)

    for name, fn, nb in cases:
        time_case(name, fn, nb)


if __name__ == "__main__":
    main()
