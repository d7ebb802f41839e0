"""INT4 vs INT8 KV decode attention probe (update + attend per step).

The int4 cache halves attention-stream bytes vs int8; this measures the
realized step time of the full update+attend composite at long-context
decode shapes (B=8, KV=32, Dh=128, S=2048 — the bench/paged_probe.py /
flash_hb_probe.py shape family) under the two-scan-length differencing
methodology. Scales ride along (ks/vs are S/32-th of payload bytes).
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
    import jax.numpy as jnp

    from protoquant_tpu.models.kv_cache import (
        Int4KVCache,
        Int8KVCache,
        K4V8KVCache,
    )

    B, KV, Dh = 8, 32, 128
    S = int(os.environ.get("SEQ", "2048"))
    H = KV
    rng = np.random.default_rng(0)
    fill = S - 64

    def mk(cls):
        c = cls.init(B, S, KV, Dh)
        warm = jnp.asarray(
            rng.standard_normal((B, fill, KV, Dh)) * 0.3, jnp.bfloat16
        )
        return jax.block_until_ready(
            jax.jit(lambda cc, w: cc.update(w, w))(c, warm)
        )

    q0 = jnp.asarray(rng.standard_normal((B, 1, H, Dh)) * 0.3, jnp.bfloat16)

    def make_run(cls, n):
        @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=())
        def run(cache, salt):
            def body(carry, i):
                cache, acc = carry
                # Vary inputs per step (defeats remote memoization) and keep
                # lengths frozen via advance=0 so the working set is stable.
                kv = q0[:, :, :KV] * (1.0 + 0.01 * (i + salt).astype(jnp.float32))
                q = q0 * (1.0 + 0.001 * i.astype(jnp.float32))
                out, cache = cache.update_and_attend(
                    q, kv, kv, advance=jnp.zeros((B,), jnp.int32)
                )
                return (cache, acc + jnp.abs(out.astype(jnp.float32)).sum()), ()

            (cache, acc), _ = jax.lax.scan(
                body, (cache, jnp.float32(0)), jnp.arange(n))
            return acc

        return run

    for name, cls, payload in (
        ("int8_kv", Int8KVCache, 2 * B * KV * S * (Dh + 4)),
        # KIVI layout: packed K/V payloads + chunk-channel K scales (G=64)
        # + per-token V scales (tails are O(G), negligible at S=2048).
        ("int4_kv", Int4KVCache,
         B * KV * (S * Dh + (S // 64) * Dh * 4 + S * 4)),
        # K4V8 (round 5): KIVI-packed int4 K (+ chunk-channel scales) and
        # per-token int8 V — ~6 bits/elem on the attend stream.
        ("k4v8_kv", K4V8KVCache,
         B * KV * (S * Dh // 2 + (S // 64) * Dh * 4 + S * Dh + S * 4)),
    ):
        lo, hi = 64, 320
        run_lo, run_hi = make_run(cls, lo), make_run(cls, hi)
        float(run_lo(mk(cls), jnp.int32(1)))
        float(run_hi(mk(cls), jnp.int32(1)))
        best_lo = best_hi = float("inf")
        for j in range(2, 6):
            c = mk(cls)
            t0 = time.perf_counter()
            float(run_lo(c, jnp.int32(j * 1009)))
            best_lo = min(best_lo, time.perf_counter() - t0)
            c = mk(cls)
            t0 = time.perf_counter()
            float(run_hi(c, jnp.int32(j * 2027)))
            best_hi = min(best_hi, time.perf_counter() - t0)
        dt = max(best_hi - best_lo, 1e-9) / (hi - lo)
        print(json.dumps({
            "case": name, "us_per_step": round(dt * 1e6, 1),
            "gbs": round(payload / dt / 1e9, 1),
            "hbm_frac": round(payload / dt / 1e9 / V5E_HBM_GBS, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
