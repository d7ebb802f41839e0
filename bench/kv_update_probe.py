"""Isolate the int8 KV-cache UPDATE cost at decode (T=1).

attention_probe.py showed the attention einsum itself runs at 0.72 int8 HBM
frac standalone, yet end-to-end decode at ctx>=2048 sits ~2.5x off roofline.
Remaining suspect: the 4 scatters in Int8KVCache.update (kq/ks/vq/vs,
head-major layout with advanced indices (b, :, s) separated by a slice) may
defeat XLA's in-place scatter and copy the whole cache every step.

Cases (all scan-in-one-program, donated carry, salted, fetch-forced):
  attend_only   — int8_kv_attention_xla on a fixed cache
  update_only   — Int8KVCache.update (the 4 scatters), cache as carry
  update_attend — the product composite
  bf16_update   — BF16KVCache.update-equivalent scatters, for reference
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


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from protoquant_tpu.models.kv_cache import BF16KVCache, Int8KVCache

    B, KV, S, Dh, T = 8, 32, 2048, 128, 1
    iters = 256
    rng = np.random.default_rng(0)
    k_new = jnp.asarray(rng.standard_normal((B, T, KV, Dh)), jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((B, T, KV, Dh)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, T, KV, Dh)), jnp.bfloat16)

    def make_i8():
        c = Int8KVCache.init(B, S, KV, Dh)
        import dataclasses

        return dataclasses.replace(
            c, lengths=jnp.full((B,), S - iters - 1, jnp.int32)
        )

    def make_bf():
        c = BF16KVCache.init(B, S, KV, Dh)
        import dataclasses

        return dataclasses.replace(
            c, lengths=jnp.full((B,), S - iters - 1, jnp.int32)
        )

    from protoquant_tpu.ops.attention import int8_kv_attention_xla

    def time_case(name, make_carry, body_fn, nbytes):
        # Two scan lengths; the difference cancels the fixed ~30-50ms tunnel
        # RTT per dispatch+fetch that otherwise floors short programs
        # (BASELINE.md "Timing methodology"; inplace_probe read_tiny showed a
        # flat ~113us/iter floor at iters=256 for a no-op body).
        def make_run(n):
            @functools.partial(jax.jit, donate_argnums=(0,))
            def run(carry, salt):
                def body(c, i):
                    kn = k_new + (0.001 * ((i + salt) % 7 - 3)).astype(jnp.bfloat16)
                    c, acc = body_fn(c, kn)
                    return c, acc

                carry, accs = jax.lax.scan(body, carry, jnp.arange(n))
                return jnp.sum(accs)

            return run

        lo, hi = iters, 4 * iters
        run_lo, run_hi = make_run(lo), make_run(hi)
        float(run_lo(make_carry(), jnp.int32(1)))
        float(run_hi(make_carry(), jnp.int32(1)))
        best_lo = best_hi = float("inf")
        for j in range(2, 5):
            t0 = time.perf_counter()
            out = run_lo(make_carry(), jnp.int32(j * 1009))
            float(out)
            best_lo = min(best_lo, time.perf_counter() - t0)
            t0 = time.perf_counter()
            out = run_hi(make_carry(), jnp.int32(j * 2027))
            float(out)
            best_hi = min(best_hi, time.perf_counter() - t0)
        dt = max(best_hi - best_lo, 1e-9) / (hi - lo)
        print(
            json.dumps(
                {
                    "case": name,
                    "us": round(dt * 1e6, 1),
                    "gbs": round(nbytes / dt / 1e9, 1),
                    "hbm_frac": round(nbytes / dt / 1e9 / V5E_HBM_GBS, 3),
                }
            ),
            flush=True,
        )

    bytes_read_i8 = 2 * B * KV * S * Dh + 8 * B * KV * S  # attend streams

    def attend_only(c, kn):
        out = int8_kv_attention_xla(q, c.kq, c.ks, c.vq, c.vs, c.lengths)
        return c, jnp.abs(out.astype(jnp.float32)).sum()

    def update_only(c, kn):
        c2 = c.update(kn, v_new)
        import dataclasses

        # Keep lengths fixed so the scan can run past S (payload wraps are
        # irrelevant for timing); consume one scattered element.
        c2 = dataclasses.replace(c2, lengths=c.lengths)
        return c2, c2.ks[0, 0, 0]

    def update_attend(c, kn):
        out, c2 = c.update_and_attend(q, kn, v_new)
        import dataclasses

        c2 = dataclasses.replace(c2, lengths=c.lengths)
        return c2, jnp.abs(out.astype(jnp.float32)).sum()

    def bf16_update(c, kn):
        import dataclasses

        B_, T_ = kn.shape[:2]
        from protoquant_tpu.models.kv_cache import _write_positions

        b_idx, s_idx = _write_positions(c.lengths, T_)
        k_all = c.k.at[b_idx, s_idx].set(kn.astype(c.k.dtype))
        v_all = c.v.at[b_idx, s_idx].set(v_new.astype(c.v.dtype))
        c2 = BF16KVCache(k=k_all, v=v_all, lengths=c.lengths)
        return c2, c2.k[0, 0, 0, 0].astype(jnp.float32)

    # ---- candidate fixes: per-batch dynamic_update_slice (in-place-able) ----
    from protoquant_tpu.models.kv_cache import quantize_kv

    def dus_update(c, kn):
        import dataclasses

        k8, ks_new = quantize_kv(kn)
        v8, vs_new = quantize_kv(v_new)
        # [B, T, KV, Dh] -> [B, KV, T, Dh] to match the head-major cache.
        k8 = jnp.swapaxes(k8, 1, 2)
        v8 = jnp.swapaxes(v8, 1, 2)
        ks_new = jnp.swapaxes(ks_new, 1, 2)
        vs_new = jnp.swapaxes(vs_new, 1, 2)
        kq, ks, vq, vs = c.kq, c.ks, c.vq, c.vs
        zero = jnp.int32(0)
        for b in range(B):
            s = c.lengths[b]
            kq = jax.lax.dynamic_update_slice(kq, k8[b : b + 1], (b, zero, s, zero))
            vq = jax.lax.dynamic_update_slice(vq, v8[b : b + 1], (b, zero, s, zero))
            ks = jax.lax.dynamic_update_slice(ks, ks_new[b : b + 1], (b, zero, s))
            vs = jax.lax.dynamic_update_slice(vs, vs_new[b : b + 1], (b, zero, s))
        c2 = Int8KVCache(kq=kq, ks=ks, vq=vq, vs=vs, lengths=c.lengths)
        return c2, c2.ks[0, 0, 0]

    def dus_fori_update(c, kn):
        k8, ks_new = quantize_kv(kn)
        v8, vs_new = quantize_kv(v_new)
        k8 = jnp.swapaxes(k8, 1, 2)
        v8 = jnp.swapaxes(v8, 1, 2)
        ks_new = jnp.swapaxes(ks_new, 1, 2)
        vs_new = jnp.swapaxes(vs_new, 1, 2)
        zero = jnp.int32(0)

        def body(b, arrs):
            kq, ks, vq, vs = arrs
            s = c.lengths[b]
            kq = jax.lax.dynamic_update_slice(
                kq, jax.lax.dynamic_slice_in_dim(k8, b, 1, 0), (b, zero, s, zero)
            )
            vq = jax.lax.dynamic_update_slice(
                vq, jax.lax.dynamic_slice_in_dim(v8, b, 1, 0), (b, zero, s, zero)
            )
            ks = jax.lax.dynamic_update_slice(
                ks, jax.lax.dynamic_slice_in_dim(ks_new, b, 1, 0), (b, zero, s)
            )
            vs = jax.lax.dynamic_update_slice(
                vs, jax.lax.dynamic_slice_in_dim(vs_new, b, 1, 0), (b, zero, s)
            )
            return kq, ks, vq, vs

        kq, ks, vq, vs = jax.lax.fori_loop(0, B, body, (c.kq, c.ks, c.vq, c.vs))
        c2 = Int8KVCache(kq=kq, ks=ks, vq=vq, vs=vs, lengths=c.lengths)
        return c2, c2.ks[0, 0, 0]

    def dus_update_attend(c, kn):
        c2, _ = dus_update(c, kn)
        out = int8_kv_attention_xla(q, c2.kq, c2.ks, c2.vq, c2.vs, c.lengths)
        return c2, jnp.abs(out.astype(jnp.float32)).sum()

    from protoquant_tpu.ops.attention import int8_kv_attention
    from protoquant_tpu.ops.kv_scatter import kv_scatter_decode

    def pl_scatter_only(c, kn):
        import dataclasses

        k8, ks_new = quantize_kv(kn)
        v8, vs_new = quantize_kv(v_new)
        kq, ks, vq, vs = kv_scatter_decode(
            c.kq, c.ks, c.vq, c.vs, c.lengths,
            jnp.swapaxes(k8, 1, 2), jnp.swapaxes(ks_new, 1, 2),
            jnp.swapaxes(v8, 1, 2), jnp.swapaxes(vs_new, 1, 2),
        )
        c2 = Int8KVCache(kq=kq, ks=ks, vq=vq, vs=vs, lengths=c.lengths)
        return c2, c2.ks[0, 0, 0]

    def pl_scatter_attend(c, kn):
        c2, _ = pl_scatter_only(c, kn)
        out = int8_kv_attention(q, c2.kq, c2.ks, c2.vq, c2.vs, c.lengths,
                                interpret=False)
        return c2, jnp.abs(out.astype(jnp.float32)).sum()

    def pl_scatter_attend_xla(c, kn):
        c2, _ = pl_scatter_only(c, kn)
        out = int8_kv_attention_xla(q, c2.kq, c2.ks, c2.vq, c2.vs, c.lengths)
        return c2, jnp.abs(out.astype(jnp.float32)).sum()

    time_case("pl_scatter_only", make_i8, pl_scatter_only, 0)
    time_case("pl_scatter_attend", make_i8, pl_scatter_attend, bytes_read_i8)
    time_case("pl_scatter_attend_xla", make_i8, pl_scatter_attend_xla, bytes_read_i8)
    time_case("attend_only", make_i8, attend_only, bytes_read_i8)
    time_case("update_only", make_i8, update_only, 0)
    time_case("update_attend", make_i8, update_attend, bytes_read_i8)
    time_case("bf16_update", make_bf, bf16_update, 0)
    time_case("dus_update", make_i8, dus_update, 0)
    time_case("dus_fori_update", make_i8, dus_fori_update, 0)
    time_case("dus_update_attend", make_i8, dus_update_attend, bytes_read_i8)


if __name__ == "__main__":
    main()
