"""Prefill GEMM overhead decomposition at M=512 (compute-bound regime).

Model-level int8 prefill runs at 0.585 MXU util while the prequantized
int8 dot alone reaches 0.69-0.78 (prefill_formulation_probe) — this probe
isolates where the ~20% goes: the f32 rank-1 dequant epilogue, the dynamic
rowquant of activations, or the int32->f32 conversion.

Compute-bound: cache residency of the 45MB weight is irrelevant (GEMM time
dominates streaming time 16x). RTT-cancelled differencing as usual.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

INT8_TOPS = 394e12
BF16_TOPS = 197e12


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    M, K, N = int(os.environ.get("M", "512")), 4096, 11008
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    x8_0 = jnp.asarray(rng.integers(-127, 128, (M, K), dtype=np.int8))
    sx0 = jnp.asarray(rng.uniform(0.005, 0.02, (M,)), jnp.float32)
    w8 = jnp.asarray(rng.integers(-127, 128, (K, N), dtype=np.int8))
    sw = jnp.asarray(rng.uniform(0.005, 0.02, (N,)), jnp.float32)
    wbf = (w8.astype(jnp.float32) * sw[None, :]).astype(jnp.bfloat16)
    flops = 2 * M * K * N

    def salt_x(x, i):  # perturb activations per iter (blocks hoisting)
        return x + ((i % 5).astype(x.dtype) * jnp.asarray(0.001, x.dtype))

    def salt_x8(x8, i):
        return x8 ^ (i % 2).astype(jnp.int8)

    def gemm_pre8(i):
        x8 = salt_x8(x8_0, i)
        acc = jax.lax.dot_general(x8, w8, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return jnp.abs(acc).sum().astype(jnp.float32)

    def gemm_pre8_epi(i):
        x8 = salt_x8(x8_0, i)
        acc = jax.lax.dot_general(x8, w8, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = (acc.astype(jnp.float32) * sx0[:, None] * sw[None, :]).astype(jnp.bfloat16)
        return jnp.abs(y.astype(jnp.float32)).sum()

    def gemm_dyn(i):
        x = salt_x(x0, i)
        xf = x.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=1), 1e-6) / 127.0
        x8 = jnp.clip(jnp.round(xf / sx[:, None]), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(x8, w8, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = (acc.astype(jnp.float32) * sx[:, None] * sw[None, :]).astype(jnp.bfloat16)
        return jnp.abs(y.astype(jnp.float32)).sum()

    def rowquant_only(i):
        x = salt_x(x0, i)
        xf = x.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=1), 1e-6) / 127.0
        x8 = jnp.clip(jnp.round(xf / sx[:, None]), -127, 127).astype(jnp.int8)
        return jnp.abs(x8.astype(jnp.float32)).sum() + sx.sum()

    def gemm_bf16(i):
        x = salt_x(x0, i)
        y = jax.lax.dot_general(x, wbf, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return jnp.abs(y).sum()

    def gemm_bf16_bfout(i):
        x = salt_x(x0, i)
        y = jax.lax.dot_general(x, wbf, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return jnp.abs(y.astype(jnp.float32)).sum()

    from protoquant_tpu.ops.rowquant import rowquant

    def gemm_dyn_pallas_rq(i):
        x = salt_x(x0, i)
        x8, sx = rowquant(x, interpret=False)
        acc = jax.lax.dot_general(x8, w8, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = (acc.astype(jnp.float32) * sx[:, None] * sw[None, :]).astype(jnp.bfloat16)
        return jnp.abs(y.astype(jnp.float32)).sum()

    def pallas_rq_only(i):
        x = salt_x(x0, i)
        x8, sx = rowquant(x, interpret=False)
        return jnp.abs(x8.astype(jnp.float32)).sum() + sx.sum()

    # Round-4: STATIC activation scales (W8A8-static, VERDICT r3 item 8
    # line of attack). A calibrated per-tensor scale removes the amax
    # REDUCTION from the quant pass — what remains is elementwise
    # multiply+round+cast that XLA can fuse. If this case lands near
    # gemm_pre8's util, the dynamic rowquant's ~15% is recoverable via a
    # calibrated static mode.
    s_act = jnp.float32(0.013)  # calibrated per-tensor scale (stand-in)

    def gemm_static(i):
        x = salt_x(x0, i)
        x8 = jnp.clip(
            jnp.round(x.astype(jnp.float32) * (1.0 / s_act)), -127, 127
        ).astype(jnp.int8)
        acc = jax.lax.dot_general(x8, w8, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = (acc.astype(jnp.float32) * (s_act * sw)[None, :]).astype(
            jnp.bfloat16
        )
        return jnp.abs(y.astype(jnp.float32)).sum()

    cases = [
        ("gemm_static", gemm_static, INT8_TOPS),
        ("gemm_dyn_pallas_rq", gemm_dyn_pallas_rq, INT8_TOPS),
        ("pallas_rq_only", pallas_rq_only, None),
        ("gemm_pre8", gemm_pre8, INT8_TOPS),
        ("gemm_pre8_epi", gemm_pre8_epi, INT8_TOPS),
        ("gemm_dyn", gemm_dyn, INT8_TOPS),
        ("rowquant_only", rowquant_only, None),
        ("gemm_bf16", gemm_bf16, BF16_TOPS),
        ("gemm_bf16_bfout", gemm_bf16_bfout, BF16_TOPS),
    ]

    for name, fn, peak in cases:
        def make_run(n, fn=fn):
            @jax.jit
            def run(salt):
                def body(acc, i):
                    return acc + fn(i + salt), ()

                acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
                return acc

            return run

        lo, hi = 64, 320
        run_lo, run_hi = make_run(lo), make_run(hi)
        float(run_lo(jnp.int32(1)))
        float(run_hi(jnp.int32(1)))
        best_lo = best_hi = float("inf")
        for j in range(2, 6):
            t0 = time.perf_counter()
            float(run_lo(jnp.int32(j * 1009)))
            best_lo = min(best_lo, time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(run_hi(jnp.int32(j * 2027)))
            best_hi = min(best_hi, time.perf_counter() - t0)
        dt = max(best_hi - best_lo, 1e-9) / (hi - lo)
        rec = {"case": name, "M": M, "us": round(dt * 1e6, 1)}
        if peak:
            rec["mxu_util"] = round(flops / dt / peak, 3)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
