"""Decode attend at 70B GQA geometry (H=64, KV=8, Dh=128): pallas vs xla.

The head-blocked flash kernel was tuned at MHA (KV=32); GQA packs TG=8
query rows per kv head and only 8 kv heads — different grid/VMEM balance.
RTT-cancelled differencing (BASELINE.md methodology).
"""

import dataclasses
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

    from protoquant_tpu.models import kv_cache as kvmod
    from protoquant_tpu.models.kv_cache import Int8KVCache

    B, H, KV, Dh, S = 8, 64, 8, 128, 2048
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, 1, H, Dh)), jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((B, 1, KV, Dh)), jnp.bfloat16)
    vn = jnp.asarray(rng.standard_normal((B, 1, KV, Dh)), jnp.bfloat16)

    def make():
        c = Int8KVCache.init(B, S, KV, Dh)
        return dataclasses.replace(c, lengths=jnp.full((B,), S - 2, jnp.int32))

    both = 2 * B * KV * S * Dh + 8 * B * KV * S

    def time_backend(name, backend):
        kvmod.ATTENTION_BACKEND = backend

        def make_run(n):
            @functools.partial(jax.jit, donate_argnums=(0,))
            def run(carry, salt):
                def body(c, i):
                    k2 = kn + (0.001 * ((i + salt) % 7 - 3)).astype(jnp.bfloat16)
                    out, c2 = c.update_and_attend(q, k2, vn)
                    c2 = dataclasses.replace(c2, lengths=c.lengths)
                    return c2, jnp.abs(out.astype(jnp.float32)).sum()

                c, accs = jax.lax.scan(body, carry, jnp.arange(n))
                return jnp.sum(accs)

            return run

        lo, hi = 128, 640
        run_lo, run_hi = make_run(lo), make_run(hi)
        float(run_lo(make(), jnp.int32(1)))
        float(run_hi(make(), jnp.int32(1)))
        bl = bh = 1e9
        for j in range(2, 6):
            c = make()
            t0 = time.perf_counter()
            float(run_lo(c, jnp.int32(j * 1009)))
            bl = min(bl, time.perf_counter() - t0)
            c = make()
            t0 = time.perf_counter()
            float(run_hi(c, jnp.int32(j * 2027)))
            bh = min(bh, time.perf_counter() - t0)
        dt = max(bh - bl, 1e-9) / (hi - lo)
        print(json.dumps({"case": name, "us": round(dt * 1e6, 1),
                          "gbs": round(both / dt / 1e9, 1),
                          "hbm_frac": round(both / dt / 1e9 / 819.0, 3)}),
              flush=True)

    time_backend("gqa70b_xla", "xla")
    time_backend("gqa70b_pallas", "pallas")


if __name__ == "__main__":
    main()
