"""Sweep Pallas qmatmul block shapes at prefill/scoring sizes on the chip.

Finds the (block_m, block_n, block_k) that maximizes achieved int8 MXU
utilization for large-M GEMMs (the compute-bound regime — SURVEY.md §6.2,
VERDICT round-1 item 1). The winner informs the M-aware auto chooser in
`ops/qmatmul.py::_pick_blocks`.

Tunnel-hardened: same scan-in-one-program + fetch-forced + salted-input
methodology as bench/kernel_bench.py (see BASELINE.md "Timing methodology").

Usage: python bench/block_sweep.py [--m 2048] [--k 4096] [--n 4096]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

V5E_INT8_TOPS = 394.0

CANDIDATES = [
    (256, 256, 512),   # round-1 default (decode-tuned)
    (512, 512, 512),
    (512, 512, 1024),
    (512, 512, 2048),
    (1024, 512, 1024),
    (512, 1024, 1024),
    # round-2 refinement: wider N / deeper K around the 512x1024x1024 winner
    (512, 1024, 512),
    (512, 1024, 2048),
    (512, 2048, 512),
    (512, 2048, 1024),
    (1024, 1024, 512),
    (1024, 1024, 1024),
]

if os.environ.get("SWEEP_BLOCKS"):  # "bm,bn,bk;bm,bn,bk" override
    CANDIDATES = [
        tuple(int(v) for v in c.split(","))
        for c in os.environ["SWEEP_BLOCKS"].split(";")
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=2048)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--target-seconds", type=float, default=0.25)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from protoquant_tpu import ops

    m, k, n = args.m, args.k, args.n
    rng = np.random.default_rng(0)
    xq = jnp.asarray(rng.integers(-126, 126, (m, k), dtype=np.int8))
    wq = jnp.asarray(rng.integers(-127, 128, (k, n), dtype=np.int8))
    s_x = jnp.ones((m,), jnp.float32)
    s_w = jnp.ones((n,), jnp.float32)

    flops = 2 * m * k * n
    sol = flops / (V5E_INT8_TOPS * 1e12)
    iters = int(max(16, min(1024, args.target_seconds / (3 * sol))))

    for bm, bn, bk in CANDIDATES:
        if bm > m or bn > n or bk > k:
            continue

        def step(a, _bm=bm, _bn=bn, _bk=bk):
            return ops.qmatmul(
                a, wq, s_x, s_w, out_dtype=jnp.bfloat16,
                block_m=_bm, block_n=_bn, block_k=_bk,
            )

        @jax.jit
        def run(x0, salt):
            def body(acc, i):
                x = (x0 + ((i + salt) % 5 - 2)).astype(x0.dtype)
                y = step(x)
                return acc + jnp.abs(y.astype(jnp.float32)).sum(), ()

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
            return acc

        float(run(xq, jnp.int32(1)))  # warmup: compile + execute + fetch
        # Chain dispatches per bracket so the ~50ms fetch RTT amortizes
        # (unchained, it deflates a ~150ms program's number by ~30%).
        chain = 3
        best = float("inf")
        for j in range(2, 5):
            salts = [jnp.int32(j * 1009 + c * 131071) for c in range(chain)]
            t0 = time.perf_counter()
            out = [run(xq, s) for s in salts]
            float(out[-1])
            best = min(best, time.perf_counter() - t0)
        dt = best / (iters * chain)
        print(
            json.dumps(
                {
                    "blocks": f"{bm}x{bn}x{bk}",
                    "shape": f"{m}x{k}x{n}",
                    "iters": iters,
                    "us": round(dt * 1e6, 1),
                    "tops": round(flops / dt / 1e12, 1),
                    "mxu_util": round(flops / dt / 1e12 / V5E_INT8_TOPS, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
