"""Split probe: where does the KIVI int4-KV decode step spend its time?

bench/int4kv_probe.py at HEAD reads ~733us/step at S=2048 vs the r3
record's 190us — but r3 measured the PRE-KIVI per-token layout. This
probe decomposes the KIVI composite: attend-only (fixed cache, packed
reads + in-kernel unpack + chunk-scale folding), update-only (tail
insert + masked flush kernel), and the composite, so the regression (or
redesign cost) lands on the right component. Same differencing harness.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from protoquant_tpu.models.kv_cache import Int4KVCache
    from protoquant_tpu.ops.attention import int4_kv_attention

    B, KV, Dh = 8, 32, 128
    S = int(os.environ.get("SEQ", "2048"))
    H = KV
    rng = np.random.default_rng(0)
    fill = S - 64

    def mk():
        c = Int4KVCache.init(B, S, KV, Dh)
        warm = jnp.asarray(
            rng.standard_normal((B, fill, KV, Dh)) * 0.3, jnp.bfloat16
        )
        return jax.block_until_ready(
            jax.jit(lambda cc, w: cc.update(w, w))(c, warm)
        )

    q0 = jnp.asarray(rng.standard_normal((B, 1, H, Dh)) * 0.3, jnp.bfloat16)

    def timed(label, make_run):
        lo, hi = 64, 320
        run_lo, run_hi = make_run(lo), make_run(hi)
        c = mk()
        float(run_lo(c, jnp.int32(1)))
        c = mk()
        float(run_hi(c, jnp.int32(1)))
        bl = bh = float("inf")
        for j in range(2, 6):
            c = mk()
            t0 = time.perf_counter()
            float(run_lo(c, jnp.int32(j * 1009)))
            bl = min(bl, time.perf_counter() - t0)
            c = mk()
            t0 = time.perf_counter()
            float(run_hi(c, jnp.int32(j * 2027)))
            bh = min(bh, time.perf_counter() - t0)
        dt = max(bh - bl, 1e-9) / (hi - lo)
        print(json.dumps({"case": label, "us_per_step": round(dt * 1e6, 1)}),
              flush=True)
        return dt

    def attend_only(n):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(cache, salt):
            def body(acc, i):
                q = q0 * (1.0 + 0.001 * i.astype(jnp.float32))
                out = int4_kv_attention(
                    q, cache.kq, cache.kchs, cache.vq, cache.vs,
                    cache.ktail, cache.kts, cache.vtail, cache.vts,
                    cache.lengths + salt * 0, cache.lengths + 1,
                    group=cache.group,
                )
                return acc + jnp.abs(out.astype(jnp.float32)).sum(), ()

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
            return acc

        return run

    def update_only(n):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(cache, salt):
            def body(carry, i):
                cache, acc = carry
                kv = q0[:, :, :KV] * (
                    1.0 + 0.01 * (i + salt).astype(jnp.float32)
                )
                cache = cache.update(
                    kv, kv, advance=jnp.zeros((B,), jnp.int32)
                )
                return (cache, acc + cache.kts.astype(jnp.float32).sum()), ()

            (cache, acc), _ = jax.lax.scan(
                body, (cache, jnp.float32(0)), jnp.arange(n))
            return acc

        return run

    def composite(n):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(cache, salt):
            def body(carry, i):
                cache, acc = carry
                kv = q0[:, :, :KV] * (
                    1.0 + 0.01 * (i + salt).astype(jnp.float32)
                )
                q = q0 * (1.0 + 0.001 * i.astype(jnp.float32))
                out, cache = cache.update_and_attend(
                    q, kv, kv, advance=jnp.zeros((B,), jnp.int32)
                )
                return (cache, acc + jnp.abs(out.astype(jnp.float32)).sum()), ()

            (cache, acc), _ = jax.lax.scan(
                body, (cache, jnp.float32(0)), jnp.arange(n))
            return acc

        return run

    timed("attend_only", attend_only)
    timed("update_only", update_only)
    timed("composite", composite)


if __name__ == "__main__":
    main()
