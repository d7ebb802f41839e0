"""Two-level W4A8 block-size sweep (prefill regime, M=512).

The requant loop runs once per (m-block, n-block, k-block) grid step —
grid order is (m, j, kk), so every extra m-block repeats the whole VPU
nibble-requant over the weights. At M=512 the default bm=256 does it
twice; bm=512 exactly once. Sweeps (block_m, block_n, block_groups)
against the measured bf16/int8 anchors from bench/w4a8_probe.py.
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

    from protoquant_tpu.core import numerics
    from protoquant_tpu.ops import w4a8_matmul

    M = int(os.environ.get("M", "512"))
    K = 4096
    N = int(os.environ.get("NCOL", "88064"))
    G = 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)) * 0.3, jnp.bfloat16)
    xq, sx = numerics.quantize_rowwise(x)
    xq, sx = jax.block_until_ready((xq, sx))
    packed_0 = jnp.asarray(rng.integers(-128, 128, (K // 2, N), dtype=np.int8))
    scales = jnp.asarray(rng.uniform(0.01, 0.05, (K // G, N)), jnp.float32)

    def mut(w, i):
        return jax.lax.dynamic_update_slice(
            w, ((i % 5) + 1).astype(jnp.int8).reshape(1, 1),
            ((i * 13) % (K // 2), (i * 7) % N))

    def timed(bm, bn, bg, ch=1):
        def fn(p):
            return w4a8_matmul(
                xq, sx, p, scales, group=G, out_dtype=jnp.bfloat16,
                formulation="two_level", block_m=bm, block_n=bn,
                block_groups=bg, dot_chunks=ch, interpret=False,
            )

        def make_run(n):
            @functools.partial(jax.jit, donate_argnums=(0,))
            def run(w, salt):
                def body(carry, i):
                    w, acc = carry
                    w = mut(w, i + salt)
                    y = fn(w)
                    return (w, acc + jnp.abs(y.astype(jnp.float32)).sum()), ()

                (w, acc), _ = jax.lax.scan(body, (w, 0.0), jnp.arange(n))
                return acc

            return run

        lo, hi = 4, 12
        run_lo, run_hi = make_run(lo), make_run(hi)
        float(run_lo(packed_0 + 0, jnp.int32(1)))
        float(run_hi(packed_0 + 0, jnp.int32(1)))
        bl = bh = 1e9
        for j in range(2, 5):
            t0 = time.perf_counter()
            float(run_lo(packed_0 + 0, jnp.int32(j * 1009)))
            bl = min(bl, time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(run_hi(packed_0 + 0, jnp.int32(j * 2027)))
            bh = min(bh, time.perf_counter() - t0)
        dt = max(bh - bl, 1e-9) / (hi - lo)
        eff = 2 * M * K * N / dt / 1e12
        print(json.dumps({
            "bm": bm, "bn": bn, "bg": bg, "chunks": ch,
            "us": round(dt * 1e6, 1), "eff_tops": round(eff, 1),
        }), flush=True)
        return dt

    # dot_chunks (round 5): split the per-step requant+dot into chunks so
    # Mosaic can overlap chunk c+1's VPU requant under chunk c's MXU dot
    # (see ops/w4a8_matmul.py::_w4a8_2l_kernel). chunks=1 == the r4 kernel.
    results = {}
    # CONFIGS="bm,bn,bg,ch;..." overrides the sweep list (focused re-runs).
    env_cfgs = os.environ.get("CONFIGS")
    cfg_list = ([tuple(int(x) for x in c.split(","))
                 for c in env_cfgs.split(";")] if env_cfgs else None)
    for bm, bn, bg, ch in cfg_list or [
        (256, 1024, 16, 1),   # r4 default (anchor)
        (512, 1024, 16, 1),   # requant once per weight block at M=512
        (512, 1024, 32, 1),   # one big K block (K=4096): single kk step
        (512, 512, 32, 1),
        (256, 2048, 16, 1),
        (512, 2048, 16, 1),
        (512, 1024, 32, 2),   # VPU/MXU overlap splits of the winner
        (512, 1024, 32, 4),
        (512, 1024, 32, 8),
        (512, 1024, 16, 2),
        (512, 1024, 16, 4),
    ]:
        try:
            results[f"{bm}_{bn}_{bg}_c{ch}"] = timed(bm, bn, bg, ch)
        except Exception as e:  # VMEM overflows etc. — record and move on
            print(json.dumps({
                "bm": bm, "bn": bn, "bg": bg, "chunks": ch,
                "error": type(e).__name__,
            }), flush=True)
    best = min(results, key=results.get)
    print(json.dumps({"best": best,
                      "best_us": round(results[best] * 1e6, 1)}), flush=True)


if __name__ == "__main__":
    main()
