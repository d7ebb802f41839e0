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
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(carry, salt):
            def body(c, i):
                kn = k_new + (0.001 * ((i + salt) % 7 - 3)).astype(jnp.bfloat16)
                c, acc = body_fn(c, kn)
                return c, acc

            carry, accs = jax.lax.scan(body, carry, jnp.arange(iters))
            return jnp.sum(accs)

        float(run(make_carry(), jnp.int32(1)))
        best = float("inf")
        for j in range(2, 5):
            t0 = time.perf_counter()
            out = run(make_carry(), jnp.int32(j * 1009))
            float(out)
            best = min(best, time.perf_counter() - t0)
        dt = best / iters
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

    time_case("attend_only", make_i8, attend_only, bytes_read_i8)
    time_case("update_only", make_i8, update_only, 0)
    time_case("update_attend", make_i8, update_attend, bytes_read_i8)
    time_case("bf16_update", make_bf, bf16_update, 0)


if __name__ == "__main__":
    main()
