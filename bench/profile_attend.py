"""Profile the decode update+attend scan on the TPU and report per-op time.

Uses jax.profiler trace -> parses the perfetto/xplane output for the top
device ops. If the tunnel doesn't support tracing, falls back to printing
that fact.
"""

import functools
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from protoquant_tpu.models.kv_cache import Int8KVCache

    B, KV, S, Dh, T = 8, 32, 2048, 128, 1
    iters = 256
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, T, KV, Dh)), jnp.bfloat16)
    k_new = jnp.asarray(rng.standard_normal((B, T, KV, Dh)), jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((B, T, KV, Dh)), jnp.bfloat16)

    def make():
        import dataclasses

        c = Int8KVCache.init(B, S, KV, Dh)
        return dataclasses.replace(c, lengths=jnp.full((B,), S - 2, jnp.int32))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(carry, salt):
        def body(c, i):
            kn = k_new + (0.001 * ((i + salt) % 7 - 3)).astype(jnp.bfloat16)
            import dataclasses

            out, c2 = c.update_and_attend(q, kn, v_new)
            c2 = dataclasses.replace(c2, lengths=c.lengths)
            return c2, jnp.abs(out.astype(jnp.float32)).sum()

        carry, accs = jax.lax.scan(body, carry, jnp.arange(iters))
        return jnp.sum(accs)

    float(run(make(), jnp.int32(1)))  # compile + warm

    logdir = "/tmp/attend_trace"
    os.system(f"rm -rf {logdir}")
    try:
        jax.profiler.start_trace(logdir)
        float(run(make(), jnp.int32(7919)))
        jax.profiler.stop_trace()
    except Exception as e:
        print(f"trace failed: {e!r}")
        return

    files = glob.glob(f"{logdir}/**/*", recursive=True)
    print("\n".join(f for f in files if os.path.isfile(f)))


if __name__ == "__main__":
    main()
