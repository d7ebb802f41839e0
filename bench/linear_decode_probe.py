"""Decode-shape linear (matvec) probe under RTT-cancelled differencing.

Is the XLA weight-only int8 matvec actually at HBM roofline, or was the
round-2 'at roofline' claim polluted by the same RTT floor the attention
probes had? Cases at 7B shapes (M=8 rows, weights dominate bytes):

  xla_wo       — product weight-only path (ops/xla_backend via QLinear math):
                 bf16 dot on int8-cast weights, row scales folded after
  xla_dyn      — dynamic path (int8 x int8 dot, rank-1 epilogue)
  pallas_wo    — ops/wo_matmul kernel
  raw_stream   — jnp.sum over the int8 weight (bandwidth ceiling)
  bf16_ref     — bf16 weights dot (2x bytes)

The weight lives in the donated scan carry and one element at a rotating
dynamic position is mutated per iteration, so no sub-slice of it is
loop-invariant (decode re-reads identical weights every step on the real
path, so a single resident set is representative).
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

    # Working set must exceed the ~128MB on-chip cache (serves vector loads
    # at ~4.7TB/s; HBM streams at ~750GB/s — see BASELINE.md "On-chip cache
    # discovery") or the numbers are cache-resident fiction for real 7B
    # decode, whose per-layer weights stream ~202MB. N=4x up-proj = 180MB.
    M, K, N = 8, 4096, int(os.environ.get("NCOL", "44032"))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    w8_0 = jnp.asarray(rng.integers(-127, 128, (K, N), dtype=np.int8))
    sw = jnp.asarray(rng.uniform(0.005, 0.02, (N,)), jnp.float32)
    wbf_0 = (w8_0.astype(jnp.float32) * sw[None, :]).astype(jnp.bfloat16)

    def mutate8(w, i):
        return jax.lax.dynamic_update_slice(
            w, ((i % 5) + 1).astype(jnp.int8).reshape(1, 1),
            ((i * 13) % K, (i * 7) % N))

    def mutate_bf(w, i):
        return jax.lax.dynamic_update_slice(
            w, ((i % 5) + 1).astype(jnp.bfloat16).reshape(1, 1),
            ((i * 13) % K, (i * 7) % N))

    def xla_wo(x, w8):
        y = jax.lax.dot_general(
            x, w8.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (y * sw[None, :]).astype(jnp.bfloat16)

    def xla_dyn(x, w8):
        xf = x.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=1), 1e-6) / 127.0
        x8 = jnp.clip(jnp.round(xf / sx[:, None]), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            x8, w8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * sx[:, None] * sw[None, :]).astype(jnp.bfloat16)

    def raw_stream(x, w8):
        return jnp.sum(w8, dtype=jnp.int32).astype(jnp.bfloat16).reshape(1, 1)

    def bf16_ref(x, wbf):
        return jax.lax.dot_general(
            x, wbf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    from protoquant_tpu.ops import weight_only_matmul

    def pallas_wo(x, w8):
        return weight_only_matmul(x, w8, sw, bias=None, interpret=False).astype(jnp.bfloat16)

    cases = [
        ("raw_stream", raw_stream, "i8"),
        ("xla_wo", xla_wo, "i8"),
        ("xla_dyn", xla_dyn, "i8"),
        ("pallas_wo", pallas_wo, "i8"),
        ("bf16_ref", bf16_ref, "bf"),
    ]

    for name, fn, kind in cases:
        nbytes = K * N * (1 if kind == "i8" else 2)
        mut = mutate8 if kind == "i8" else mutate_bf

        def make_run(n, fn=fn, mut=mut):
            @functools.partial(jax.jit, donate_argnums=(0,))
            def run(w, salt):
                def body(carry, i):
                    w, acc = carry
                    w = mut(w, i + salt)  # in-place on the donated carry
                    y = fn(x, w)
                    return (w, acc + jnp.abs(y.astype(jnp.float32)).sum()), ()

                (w, acc), _ = jax.lax.scan(
                    body, (w, jnp.float32(0)), jnp.arange(n))
                return acc

            return run

        lo, hi = 128, 640
        run_lo, run_hi = make_run(lo), make_run(hi)

        @jax.jit
        def fresh(w0, salt, kind=kind):
            # w0 as an argument: closure-capturing a 360MB literal exceeds
            # the tunnel's remote-compile body limit (HTTP 413).
            if kind == "i8":
                return w0 + (salt % 3).astype(jnp.int8)
            return (w0 * (1 + 0.01 * (salt % 3).astype(jnp.float32))).astype(w0.dtype)

        def init(s):
            w = fresh(w8_0 if kind == "i8" else wbf_0, jnp.int32(s))
            jax.block_until_ready(w)
            return w

        float(run_lo(init(1), jnp.int32(1)))
        float(run_hi(init(2), jnp.int32(1)))
        best_lo = best_hi = float("inf")
        for j in range(2, 6):
            w = init(j)
            t0 = time.perf_counter()
            float(run_lo(w, jnp.int32(j * 1009)))
            best_lo = min(best_lo, time.perf_counter() - t0)
            w = init(j + 17)
            t0 = time.perf_counter()
            float(run_hi(w, jnp.int32(j * 2027)))
            best_hi = min(best_hi, time.perf_counter() - t0)
        dt = max(best_hi - best_lo, 1e-9) / (hi - lo)
        print(json.dumps({
            "case": name, "us": round(dt * 1e6, 1),
            "gbs": round(nbytes / dt / 1e9, 1),
            "hbm_frac": round(nbytes / dt / 1e9 / V5E_HBM_GBS, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
