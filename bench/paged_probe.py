"""Paged decode attention: gather+XLA vs in-place scatter + head-blocked
paged Pallas kernel, at serving shape (B=8, KV=32, Dh=128, S~2048).

RTT-cancelled two-scan-length differencing (BASELINE.md methodology).
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

    from protoquant_tpu.engine.paged_kv import PagedInt8KVCache
    from protoquant_tpu.models import kv_cache as kvmod

    B, KV, Dh, ps = 8, 32, 128, int(os.environ.get("PS", "64"))
    S = 2048
    maxP = S // ps
    P = B * maxP + 2
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, 1, KV, Dh)), jnp.bfloat16)
    k_new = jnp.asarray(rng.standard_normal((B, 1, KV, Dh)), jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((B, 1, KV, Dh)), jnp.bfloat16)

    import dataclasses

    def make():
        c = PagedInt8KVCache.init(B, P, maxP, ps, KV, Dh)
        pt = jnp.arange(B * maxP, dtype=jnp.int32).reshape(B, maxP)
        c = dataclasses.replace(
            c,
            page_table=pt,
            lengths=jnp.full((B,), S - 2, jnp.int32),
            kq=jnp.asarray(rng.integers(-100, 100, (P, KV, ps, Dh), dtype=np.int8)),
            vq=jnp.asarray(rng.integers(-100, 100, (P, KV, ps, Dh), dtype=np.int8)),
            ks=jnp.asarray(rng.uniform(0.01, 0.03, (P, KV, 1, ps)), jnp.float32),
            vs=jnp.asarray(rng.uniform(0.01, 0.03, (P, KV, 1, ps)), jnp.float32),
        )
        jax.block_until_ready(c.kq)
        return c

    nbytes = 2 * B * KV * S * Dh + 8 * B * KV * S

    def time_backend(name, backend):
        prev = kvmod.ATTENTION_BACKEND
        kvmod.ATTENTION_BACKEND = backend
        try:
            def make_run(n):
                @functools.partial(jax.jit, donate_argnums=(0,))
                def run(carry, salt):
                    def body(c, i):
                        kn = k_new + (0.001 * ((i + salt) % 7 - 3)).astype(jnp.bfloat16)
                        out, c2 = c.update_and_attend(q, kn, v_new)
                        c2 = dataclasses.replace(c2, lengths=c.lengths)
                        return c2, jnp.abs(out.astype(jnp.float32)).sum()

                    c, accs = jax.lax.scan(body, carry, jnp.arange(n))
                    return jnp.sum(accs)

                return run

            lo, hi = 128, 640
            run_lo, run_hi = make_run(lo), make_run(hi)
            float(run_lo(make(), jnp.int32(1)))
            float(run_hi(make(), jnp.int32(1)))
            best_lo = best_hi = float("inf")
            for j in range(2, 6):
                c = make()
                t0 = time.perf_counter()
                float(run_lo(c, jnp.int32(j * 1009)))
                best_lo = min(best_lo, time.perf_counter() - t0)
                c = make()
                t0 = time.perf_counter()
                float(run_hi(c, jnp.int32(j * 2027)))
                best_hi = min(best_hi, time.perf_counter() - t0)
            dt = max(best_hi - best_lo, 1e-9) / (hi - lo)
            print(json.dumps({
                "case": name, "ps": ps, "us": round(dt * 1e6, 1),
                "gbs": round(nbytes / dt / 1e9, 1),
                "hbm_frac": round(nbytes / dt / 1e9 / V5E_HBM_GBS, 3),
            }), flush=True)
        finally:
            kvmod.ATTENTION_BACKEND = prev

    time_backend("paged_gather_xla", "xla")
    time_backend("paged_pallas", "pallas")


if __name__ == "__main__":
    main()
