"""int4 decode break-even probe: legacy vs split wo4 formulations vs bf16.

Round-2 status (BASELINE.md "int4 storage status"): the packed-nibble
Pallas kernel measured 0.73-0.75x bf16 at decode — below break-even despite
quarter the HBM bytes, i.e. bound by per-weight VPU work, not DMA. The
round-3 "split" formulation (ops/wo4_matmul.py::_wo4_split_kernel) moves
the group scale out of the weight tile (scale-after-dot on the (bm, bn)
partial) and feeds raw bf16 nibbles to the MXU via two half-K dots (no
concat relayout). This probe measures both formulations against the bf16
dense reference and the packed-byte streaming ceiling under the repo's
RTT-cancelled differencing methodology (see linear_decode_probe.py).

Working set: packed nibbles at K=4096 x N=88064 = 180MB > the ~128MB
on-chip cache, so the stream is HBM-real (BASELINE.md cache discovery).
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

    from protoquant_tpu.ops import weight_only_int4_matmul

    M, K = 8, 4096
    N = int(os.environ.get("NCOL", "88064"))
    G = 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    packed_0 = jnp.asarray(rng.integers(-128, 128, (K // 2, N), dtype=np.int8))
    scales = jnp.asarray(rng.uniform(0.01, 0.05, (K // G, N)), jnp.float32)
    wbf_0 = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.bfloat16)

    def mutate8(w, i):
        return jax.lax.dynamic_update_slice(
            w, ((i % 5) + 1).astype(jnp.int8).reshape(1, 1),
            ((i * 13) % (K // 2), (i * 7) % N))

    def mutate_bf(w, i):
        return jax.lax.dynamic_update_slice(
            w, ((i % 5) + 1).astype(jnp.bfloat16).reshape(1, 1),
            ((i * 13) % K, (i * 7) % N))

    BN = int(os.environ.get("BN", "2048"))
    KB = int(os.environ.get("KB", "8"))

    def wo4_split(x, p):
        return weight_only_int4_matmul(
            x, p, scales, group=G, interpret=False, formulation="split",
            block_n=BN, block_groups=KB,
        ).astype(jnp.bfloat16)

    def wo4_legacy(x, p):
        return weight_only_int4_matmul(
            x, p, scales, group=G, interpret=False, formulation="legacy",
        ).astype(jnp.bfloat16)

    def raw_stream(x, p):
        return jnp.sum(p, dtype=jnp.int32).astype(jnp.bfloat16).reshape(1, 1)

    def bf16_ref(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    cases = [
        ("raw_stream_packed", raw_stream, "p"),
        ("pallas_wo4_split", wo4_split, "p"),
        ("pallas_wo4_legacy", wo4_legacy, "p"),
        ("bf16_ref", bf16_ref, "bf"),
    ]

    times = {}
    for name, fn, kind in cases:
        nbytes = (K // 2) * N if kind == "p" else K * N * 2
        mut = mutate8 if kind == "p" else mutate_bf

        def make_run(n, fn=fn, mut=mut):
            @functools.partial(jax.jit, donate_argnums=(0,))
            def run(w, salt):
                def body(carry, i):
                    w, acc = carry
                    w = mut(w, i + salt)
                    y = fn(x, w)
                    return (w, acc + jnp.abs(y.astype(jnp.float32)).sum()), ()

                (w, acc), _ = jax.lax.scan(
                    body, (w, jnp.float32(0)), jnp.arange(n))
                return acc

            return run

        lo, hi = 64, 320
        run_lo, run_hi = make_run(lo), make_run(hi)

        @jax.jit
        def fresh(w0, salt, kind=kind):
            if kind == "p":
                return w0 + (salt % 3).astype(jnp.int8)
            return (w0 * (1 + 0.01 * (salt % 3).astype(jnp.float32))).astype(w0.dtype)

        def init(s, kind=kind):
            w = fresh(packed_0 if kind == "p" else wbf_0, jnp.int32(s))
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
        times[name] = dt
        print(json.dumps({
            "case": name, "us": round(dt * 1e6, 1),
            "gbs": round(nbytes / dt / 1e9, 1),
            "hbm_frac": round(nbytes / dt / 1e9 / V5E_HBM_GBS, 3),
        }), flush=True)

    if "bf16_ref" in times:
        for k in ("pallas_wo4_split", "pallas_wo4_legacy"):
            if k in times:
                print(json.dumps({
                    "speedup_vs_bf16": {k: round(times["bf16_ref"] / times[k], 3)}
                }), flush=True)


if __name__ == "__main__":
    main()
