"""Kernel-tier microbenchmarks + roofline accounting (SURVEY.md §4.2 item 6).

For each hot kernel, reports achieved GB/s (vs v5e HBM ~819 GB/s), TOP/s,
and MXU utilization (vs v5e ~394 int8 TOP/s, ~197 bf16 TFLOP/s), for the
Pallas tier, the XLA-fused backend, and the bf16 baseline dot.

Tunnel-hardened methodology (see BASELINE.md "timing methodology"): each
kernel is timed as a lax.scan of N invocations inside ONE jitted program —
per-call dispatch through this environment's TPU tunnel costs ~50ms RTT and
block_until_ready() can return while the background compile is still in
flight, so only whole-loop-in-one-program timings with a forced host fetch
are faithful. The scan varies the activation every step (defeats remote
memoization) and folds |y| into a scalar carry (defeats dead-code
elimination and algebraic collapse through the matmul).

Usage: python bench/kernel_bench.py [--shapes decode|prefill|square] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

V5E_HBM_GBS = 819.0
V5E_INT8_TOPS = 394.0
V5E_BF16_TFLOPS = 197.0


def scan_time(step_fn, x0, iters, int_vary, chain=3):
    """Mean seconds per invocation of step_fn, measured as a scan of `iters`
    steps inside one jit, best of 3 fetch-forced brackets.

    Each bracket chains `chain` salted dispatches back-to-back on the device
    stream and fetches only the last: the ~50 ms per-fetch tunnel RTT then
    amortizes over the whole chain instead of deflating one program's number
    (BASELINE.md "Timing methodology" item 3)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x0, salt):
        def body(acc, i):
            if int_vary:
                x = (x0 + ((i + salt) % 5 - 2)).astype(x0.dtype)
            else:
                x = x0 * (1.0 + 0.001 * ((i + salt) % 7 - 3)).astype(x0.dtype)
            y = step_fn(x)
            return acc + jnp.abs(y.astype(jnp.float32)).sum(), ()

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return acc

    float(run(x0, jnp.int32(1)))  # warmup: compile + execute + fetch
    best = float("inf")
    for k in range(2, 5):
        salts = [jnp.int32(k * 1009 + j * 131071) for j in range(chain)]
        t0 = time.perf_counter()
        out = [run(x0, s) for s in salts]
        float(out[-1])
        best = min(best, time.perf_counter() - t0)
    return best / (iters * chain)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--shapes", default="decode", choices=["decode", "prefill", "square"]
    )
    ap.add_argument("--target-seconds", type=float, default=0.25)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from protoquant_tpu import ops

    shapes = {
        "decode": [(8, 4096, 4096), (8, 4096, 11008), (8, 11008, 4096)],
        "prefill": [(512, 4096, 4096), (512, 4096, 11008), (2048, 4096, 4096)],
        "square": [(1024, 1024, 1024), (4096, 4096, 4096)],
    }[args.shapes]

    rng = np.random.default_rng(0)
    results = []
    for m, k, n in shapes:
        xq = jnp.asarray(rng.integers(-126, 126, (m, k), dtype=np.int8))
        wq = jnp.asarray(rng.integers(-127, 128, (k, n), dtype=np.int8))
        s_x = jnp.ones((m,), jnp.float32)
        s_w = jnp.ones((n,), jnp.float32)
        x_bf = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        w_bf = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)

        flops = 2 * m * k * n
        bytes_q = m * k + k * n + 2 * m * n
        bytes_bf = 2 * m * k + 2 * k * n + 4 * m * n
        # Iter count: ~target_seconds of real work assuming ~3x off the
        # binding roofline (keeps each program in the tunnel's faithful
        # window — too long and the remote executor hangs, see BASELINE.md).
        sol = max(flops / (V5E_BF16_TFLOPS * 1e12), bytes_q / (V5E_HBM_GBS * 1e9))
        iters = int(max(32, min(4096, args.target_seconds / (3 * sol))))

        dt_q = scan_time(
            lambda a: ops.qmatmul(a, wq, s_x, s_w, out_dtype=jnp.bfloat16),
            xq, iters, int_vary=True,
        )
        dt_dxla = scan_time(
            lambda a: ops.dynamic_qlinear_xla(a, wq, s_w, out_dtype=jnp.bfloat16),
            x_bf, iters, int_vary=False,
        )
        # Apples-to-apples vs qmatmul: the XLA int8 GEMM fed PREQUANTIZED
        # int8 (the product path shares rowquant across sibling projections,
        # so the GEMM-only comparison is the fair one; dyn_xla above also
        # pays for its in-graph rowquant).
        dt_xs8 = scan_time(
            lambda a: ops.dynamic_qlinear_xla(
                a.astype(jnp.bfloat16), wq, s_w, out_dtype=jnp.bfloat16,
                prequantized=(a, s_x),
            ),
            xq, iters, int_vary=True,
        )
        dt_wo = scan_time(
            lambda a: ops.weight_only_matmul(a, wq, s_w), x_bf, iters,
            int_vary=False,
        )
        dt_bf = scan_time(
            lambda a: jnp.dot(a, w_bf, preferred_element_type=jnp.float32),
            x_bf, iters, int_vary=False,
        )
        dt_rq = scan_time(lambda a: ops.rowquant(a)[0], x_bf, iters, int_vary=False)
        # int4 weight-only (pallas wo4 kernel): packed nibbles + group scales.
        from protoquant_tpu.core.qtensor import QTensor4

        qt4 = QTensor4.quantize(np.asarray(w_bf, np.float32), group=128)
        w4, s4 = qt4.data, qt4.scale
        dt_w4 = scan_time(
            lambda a: ops.weight_only_int4_matmul(a, w4, s4, 128),
            x_bf, iters, int_vary=False,
        )
        bytes_w4 = 2 * m * k + k * n // 2 + 4 * (k // 128) * n + 2 * m * n

        bytes_rq = 2 * m * k + m * k + 4 * m
        results.append(
            {
                "shape": f"{m}x{k}x{n}",
                "iters": iters,
                "qmatmul_us": round(dt_q * 1e6, 1),
                "qmatmul_tops": round(flops / dt_q / 1e12, 2),
                "qmatmul_mxu_util": round(flops / dt_q / 1e12 / V5E_INT8_TOPS, 3),
                "qmatmul_hbm_frac": round(bytes_q / dt_q / 1e9 / V5E_HBM_GBS, 3),
                "dyn_xla_us": round(dt_dxla * 1e6, 1),
                "dyn_xla_tops": round(flops / dt_dxla / 1e12, 2),
                "dyn_xla_mxu_util": round(
                    flops / dt_dxla / 1e12 / V5E_INT8_TOPS, 3
                ),
                "dyn_xla_hbm_frac": round(
                    bytes_q / dt_dxla / 1e9 / V5E_HBM_GBS, 3
                ),
                "xla_s8_us": round(dt_xs8 * 1e6, 1),
                "xla_s8_tops": round(flops / dt_xs8 / 1e12, 2),
                "xla_s8_mxu_util": round(
                    flops / dt_xs8 / 1e12 / V5E_INT8_TOPS, 3
                ),
                "wo_matmul_us": round(dt_wo * 1e6, 1),
                "wo_gbs": round(bytes_q / dt_wo / 1e9, 1),
                "xla_bf16_us": round(dt_bf * 1e6, 1),
                "xla_bf16_mxu_util": round(
                    flops / dt_bf / 1e12 / V5E_BF16_TFLOPS, 3
                ),
                "xla_bf16_hbm_frac": round(
                    bytes_bf / dt_bf / 1e9 / V5E_HBM_GBS, 3
                ),
                "pallas_speedup_vs_bf16": round(dt_bf / dt_q, 2),
                "xla_int8_speedup_vs_bf16": round(dt_bf / dt_dxla, 2),
                "rowquant_us": round(dt_rq * 1e6, 1),
                "rowquant_gbs": round(bytes_rq / dt_rq / 1e9, 1),
                "wo4_us": round(dt_w4 * 1e6, 1),
                "wo4_gbs": round(bytes_w4 / dt_w4 / 1e9, 1),
                "wo4_speedup_vs_bf16": round(dt_bf / dt_w4, 2),
            }
        )
        print(json.dumps(results[-1]), flush=True)

    print(
        json.dumps(
            {
                "device": str(jax.devices()[0]),
                "rooflines": {
                    "hbm_gbs": V5E_HBM_GBS,
                    "int8_tops": V5E_INT8_TOPS,
                    "bf16_tflops": V5E_BF16_TFLOPS,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
