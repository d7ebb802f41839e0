"""Minimal probe: does XLA update a big int8 loop-carry in place on this
runtime, and which formulation breaks it?

Cases (scan over 256 iters, one 64MB int8 array [8,32,2048,128] as carry):
  dus_static      — DUS of (1,1,1,Dh) at a static position
  dus_dynamic     — DUS at a per-iteration dynamic position
  dus_perbatch    — 8 unrolled DUS, per-batch dynamic s (the kv pattern, 1 array)
  scatter_perbatch— one advanced-index scatter .at[b,: ,s].set (current product)
  dus_4arrays     — the perbatch pattern on kq+vq+ks+vs together (full pattern)
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

    B, KV, S, Dh = 8, 32, 2048, 128
    iters = 256
    rng = np.random.default_rng(0)
    upd = jnp.asarray(rng.integers(-127, 127, (B, KV, 1, Dh)), jnp.int8)
    lengths = jnp.full((B,), 100, jnp.int32) + jnp.arange(B, dtype=jnp.int32)

    def time_case(name, init_fn, body_fn):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(carry, salt):
            def body(c, i):
                c = body_fn(c, i + salt)
                return c, ()

            carry, _ = jax.lax.scan(body, carry, jnp.arange(iters))
            leaves = jax.tree_util.tree_leaves(carry)
            return sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves)

        float(run(init_fn(), jnp.int32(1)))
        best = float("inf")
        for j in range(2, 5):
            t0 = time.perf_counter()
            out = run(init_fn(), jnp.int32(j * 1009))
            float(out)
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"case": name, "us_per_iter": round(best / iters * 1e6, 1)}), flush=True)

    def init1():
        return jnp.zeros((B, KV, S, Dh), jnp.int8)

    def dus_static(c, i):
        return jax.lax.dynamic_update_slice(
            c, (upd + (i % 3).astype(jnp.int8)), (0, 0, 500, 0)
        )

    def dus_dynamic(c, i):
        return jax.lax.dynamic_update_slice(
            c, (upd + (i % 3).astype(jnp.int8)), (0, 0, (i % 1000).astype(jnp.int32), 0)
        )

    def dus_perbatch(c, i):
        z = jnp.int32(0)
        for b in range(B):
            c = jax.lax.dynamic_update_slice(
                c, upd[b : b + 1] + (i % 3).astype(jnp.int8), (b, z, lengths[b] + i % 7, z)
            )
        return c

    def scatter_perbatch(c, i):
        b_idx = jnp.arange(B)[:, None]
        s_idx = (lengths + i % 7)[:, None]
        blk = jnp.swapaxes(upd, 1, 2) + (i % 3).astype(jnp.int8)  # [B,1,KV,Dh]
        return c.at[b_idx, :, s_idx].set(blk)

    def init4():
        return (
            jnp.zeros((B, KV, S, Dh), jnp.int8),
            jnp.zeros((B, KV, S), jnp.float32),
            jnp.zeros((B, KV, S, Dh), jnp.int8),
            jnp.zeros((B, KV, S), jnp.float32),
        )

    supd = jnp.ones((1, KV, 1), jnp.float32)

    def dus_4arrays(arrs, i):
        kq, ks, vq, vs = arrs
        z = jnp.int32(0)
        d = (i % 3).astype(jnp.int8)
        for b in range(B):
            s = lengths[b] + i % 7
            kq = jax.lax.dynamic_update_slice(kq, upd[b : b + 1] + d, (b, z, s, z))
            vq = jax.lax.dynamic_update_slice(vq, upd[b : b + 1] - d, (b, z, s, z))
            ks = jax.lax.dynamic_update_slice(ks, supd, (b, z, s))
            vs = jax.lax.dynamic_update_slice(vs, supd, (b, z, s))
        return kq, ks, vq, vs

    time_case("dus_static", init1, dus_static)
    time_case("dus_dynamic", init1, dus_dynamic)
    time_case("dus_perbatch", init1, dus_perbatch)
    time_case("scatter_perbatch", init1, scatter_perbatch)
    time_case("dus_4arrays", init4, dus_4arrays)

    # ---- size sweep: copy-per-iter (scales with S) vs fixed overhead ----
    for S_ in (256, 1024, 8192):
        init_s = lambda S_=S_: jnp.zeros((B, KV, S_, Dh), jnp.int8)

        def dus_s(c, i, S_=S_):
            return jax.lax.dynamic_update_slice(
                c, (upd + (i % 3).astype(jnp.int8)), (0, 0, (i % (S_ - 2)).astype(jnp.int32), 0)
            )

        time_case(f"dus_dynamic_S{S_}", init_s, dus_s)

    # Pure carry pass-through with a tiny read: loop overhead floor.
    def init_pair():
        return (jnp.zeros((B, KV, S, Dh), jnp.int8), jnp.zeros((), jnp.float32))

    def read_tiny(c, i):
        big, acc = c
        return big, acc + big[0, 0, (i % 100).astype(jnp.int32), 0].astype(jnp.float32)

    time_case("read_tiny", init_pair, read_tiny)


if __name__ == "__main__":
    main()
