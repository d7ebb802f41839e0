"""Kernel-tier microbenchmarks + roofline accounting (SURVEY.md §4.2 item 6).

For each hot kernel, reports achieved GB/s (vs v5e HBM ~819 GB/s) and
TOP/s (vs v5e MXU ~394 int8 TOP/s, ~197 bf16 TFLOP/s), plus a comparison
against the XLA bf16 dot (the only usable XLA matmul baseline on this
platform — XLA's integer-accumulate dot hangs in compile, SURVEY.md §0.3).

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


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax_block(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax_block(out)
    return (time.perf_counter() - t0) / iters


def jax_block(x):
    import jax

    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a, x
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--shapes", default="decode", choices=["decode", "prefill", "square"]
    )
    ap.add_argument("--iters", type=int, default=20)
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
        xq = jnp.asarray(rng.integers(-127, 128, (m, k), dtype=np.int8))
        wq = jnp.asarray(rng.integers(-127, 128, (k, n), dtype=np.int8))
        s_x = jnp.ones((m,), jnp.float32)
        s_w = jnp.ones((n,), jnp.float32)
        x_bf = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        w_bf = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)

        dt_q = timeit(
            lambda a, b: ops.qmatmul(a, b, s_x, s_w, out_dtype=jnp.bfloat16),
            xq,
            wq,
            iters=args.iters,
        )
        dt_wo = timeit(
            lambda a, b: ops.weight_only_matmul(a, b, s_w),
            x_bf,
            wq,
            iters=args.iters,
        )
        bf16_dot = jax.jit(
            lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
        )
        dt_bf = timeit(bf16_dot, x_bf, w_bf, iters=args.iters)
        dt_rq = timeit(lambda a: ops.rowquant(a), x_bf, iters=args.iters)

        flops = 2 * m * k * n
        # Decode-regime byte traffic is weight-streaming dominated.
        bytes_q = m * k + k * n + 2 * m * n
        bytes_bf = 2 * m * k + 2 * k * n + 4 * m * n
        bytes_rq = 2 * m * k + m * k + 4 * m

        results.append(
            {
                "shape": f"{m}x{k}x{n}",
                "qmatmul_us": round(dt_q * 1e6, 1),
                "qmatmul_tops": round(flops / dt_q / 1e12, 2),
                "qmatmul_gbs": round(bytes_q / dt_q / 1e9, 1),
                "qmatmul_hbm_frac": round(bytes_q / dt_q / 1e9 / V5E_HBM_GBS, 3),
                "wo_matmul_us": round(dt_wo * 1e6, 1),
                "wo_gbs": round(bytes_q / dt_wo / 1e9, 1),
                "xla_bf16_us": round(dt_bf * 1e6, 1),
                "xla_bf16_gbs": round(bytes_bf / dt_bf / 1e9, 1),
                "speedup_vs_bf16": round(dt_bf / dt_q, 2),
                "rowquant_us": round(dt_rq * 1e6, 1),
                "rowquant_gbs": round(bytes_rq / dt_rq / 1e9, 1),
            }
        )
        print(json.dumps(results[-1]))

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
