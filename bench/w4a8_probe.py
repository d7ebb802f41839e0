"""W4A8 probe: int4-weight x int8-activation (int8 MXU) vs wo4 (bf16 MXU)
vs dynamic int8 vs bf16, at prefill and decode shapes.

The thesis: weight_only_int4 streams quarter bytes but runs the bf16 MXU —
at PREFILL (M large) it is compute-bound at half the int8 rate. W4A8
(ops/w4a8_matmul.py) keeps the quarter-byte stream and moves the dots to
the int8 MXU. Decode (M=8) is bandwidth-bound, so both int4 tiers should
tie there; prefill (M=512) is where W4A8 earns its keep.

Same RTT-cancelled scan-differencing as bench/wo4_probe.py; weights mutate
per step to defeat remote memoization. Working set 180MB packed (dense
int8 360MB, bf16 720MB) > the ~128MB on-chip cache.
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

    from protoquant_tpu.core import numerics
    from protoquant_tpu.ops import (
        dynamic_qlinear_xla,
        w4a8_matmul,
        weight_only_int4_matmul,
    )

    M = int(os.environ.get("M", "512"))
    K = 4096
    N = int(os.environ.get("NCOL", "88064"))
    G = 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)) * 0.3, jnp.bfloat16)
    xq, sx = numerics.quantize_rowwise(x)
    xq, sx = jax.block_until_ready((xq, sx))
    packed_0 = jnp.asarray(rng.integers(-128, 128, (K // 2, N), dtype=np.int8))
    w8_0 = jnp.asarray(rng.integers(-127, 128, (K, N), dtype=np.int8))
    scales = jnp.asarray(rng.uniform(0.01, 0.05, (K // G, N)), jnp.float32)
    sw8 = jnp.asarray(rng.uniform(0.01, 0.05, (N,)), jnp.float32)
    wbf_0 = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.bfloat16)

    def mut_i8(w, i, rows):
        return jax.lax.dynamic_update_slice(
            w, ((i % 5) + 1).astype(jnp.int8).reshape(1, 1),
            ((i * 13) % rows, (i * 7) % N))

    def mut_bf(w, i):
        return jax.lax.dynamic_update_slice(
            w, ((i % 5) + 1).astype(jnp.bfloat16).reshape(1, 1),
            ((i * 13) % K, (i * 7) % N))

    def w4a8(p):
        return w4a8_matmul(
            xq, sx, p, scales, group=G, out_dtype=jnp.bfloat16,
            interpret=False,
        )

    def w4a8_2l(p):
        return w4a8_matmul(
            xq, sx, p, scales, group=G, out_dtype=jnp.bfloat16,
            formulation="two_level", interpret=False,
        )

    def wo4(p):
        # Decode-tuned default blocks (bm 256 x bn 2048) blow VMEM at
        # M=512; halve bn for the prefill regime.
        return weight_only_int4_matmul(
            x, p, scales, group=G, interpret=False, formulation="split",
            block_n=1024 if M >= 256 else 2048,
        ).astype(jnp.bfloat16)

    def int8_dyn(w):
        return dynamic_qlinear_xla(
            x, w, sw8, None, out_dtype=jnp.bfloat16,
            prequantized=(xq, sx),
        )

    def bf16_ref(w):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    cases = [
        ("w4a8_pallas", w4a8, "p"),
        ("w4a8_two_level_pallas", w4a8_2l, "p"),
        ("wo4_split_pallas", wo4, "p"),
        ("int8_dynamic_xla", int8_dyn, "w8"),
        ("bf16_ref", bf16_ref, "bf"),
    ]

    times = {}
    for name, fn, kind in cases:
        nbytes = {"p": (K // 2) * N, "w8": K * N, "bf": K * N * 2}[kind]
        rows = K // 2 if kind == "p" else K
        mut = mut_bf if kind == "bf" else functools.partial(mut_i8, rows=rows)

        def make_run(n, fn=fn, mut=mut):
            @functools.partial(jax.jit, donate_argnums=(0,))
            def run(w, salt):
                def body(carry, i):
                    w, acc = carry
                    w = mut(w, i + salt)
                    y = fn(w)
                    return (w, acc + jnp.abs(y.astype(jnp.float32)).sum()), ()

                (w, acc), _ = jax.lax.scan(
                    body, (w, jnp.float32(0)), jnp.arange(n))
                return acc

            return run

        steps = (16, 48) if M >= 256 else (64, 320)
        lo, hi = steps
        run_lo, run_hi = make_run(lo), make_run(hi)
        w0 = {"p": packed_0, "w8": w8_0, "bf": wbf_0}[kind]

        @jax.jit
        def fresh(w0, salt, kind=kind):
            if kind == "bf":
                return (w0 * (1 + 0.01 * (salt % 3).astype(jnp.float32))).astype(w0.dtype)
            return w0 + (salt % 3).astype(jnp.int8)

        def init(s):
            w = fresh(w0, jnp.int32(s))
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
            "case": name, "M": M, "us": round(dt * 1e6, 1),
            "weight_gbs": round(nbytes / dt / 1e9, 1),
            "hbm_frac": round(nbytes / dt / 1e9 / V5E_HBM_GBS, 3),
            "eff_tops": round(2 * M * K * N / dt / 1e12, 1),
        }), flush=True)

    ref = times.get("bf16_ref")
    if ref:
        print(json.dumps({
            "speedup_vs_bf16": {
                k: round(ref / v, 3) for k, v in times.items() if k != "bf16_ref"
            }
        }), flush=True)


if __name__ == "__main__":
    main()
