"""fp8 (e4m3) on-TPU status probe.

The fp8 weight/KV modes (core/qtensor.py::QTensorF8, models/kv_cache.py fp8
KV) were built and CPU-verified while the TPU tunnel was down; this probe
answers the deferred questions on the real chip (ROADMAP item / BASELINE.md
"fp8 on-TPU status"):

  1. Does float8_e4m3fn transfer to the device and round-trip?
  2. Does the weight-only fp8 path (cast-to-bf16 riding the dot operand)
     compile and match the CPU result?
  3. Decode-shape timing: fp8 weight-only matvec vs int8 weight-only vs
     bf16 — fp8 should track int8 (same HBM bytes).

Usage: python bench/fp8_probe.py   (prints one JSON line)
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=30):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    result = {"device": str(jax.devices()[0])}

    # 1. transfer + round-trip
    rng = np.random.default_rng(0)
    x = rng.standard_normal((256, 256)).astype(np.float32)
    try:
        x8 = jnp.asarray(x, jnp.float8_e4m3fn)
        back = np.asarray(x8.astype(jnp.float32))
        rel = np.abs(back - np.clip(x, -448, 448)) / (np.abs(x) + 1e-9)
        result["transfer_ok"] = bool(np.median(rel) < 0.07)
    except Exception as e:  # noqa: BLE001 — probe records, never raises
        result["transfer_ok"] = False
        result["transfer_err"] = repr(e)[:200]
        print(json.dumps(result))
        return

    # 2. weight-only fp8 linear correctness vs CPU f32
    from protoquant_tpu.core.qtensor import QTensorF8

    K, N = 4096, 4096
    w = (rng.standard_normal((K, N)) * 0.02).astype(np.float32)
    xv = rng.standard_normal((8, K)).astype(np.float32)
    qw = QTensorF8.quantize(jnp.asarray(w), axis=0)

    @jax.jit
    def fp8_matmul(data, scale, xb):
        return (xb.astype(jnp.bfloat16) @ data.astype(jnp.bfloat16)) * scale

    y = np.asarray(fp8_matmul(qw.data, qw.scale, jnp.asarray(xv)))
    y_ref = xv @ (np.asarray(qw.data.astype(jnp.float32)) * np.asarray(qw.scale))
    cos = float(np.sum(y * y_ref) / (np.linalg.norm(y) * np.linalg.norm(y_ref) + 1e-12))
    result["matmul_cosine_vs_ref"] = round(cos, 6)
    result["matmul_ok"] = cos > 0.999

    # 3. decode-shape timing (matvec M=8): fp8 vs int8 vs bf16 weights
    w8i = jnp.asarray(
        np.clip(np.round(w / (np.abs(w).max(0) / 127)), -127, 127), np.int8
    )
    s_i = jnp.asarray(np.abs(w).max(0) / 127)
    wbf = jnp.asarray(w, jnp.bfloat16)
    xb = jnp.asarray(xv, jnp.bfloat16)

    @jax.jit
    def int8_matmul(data, scale, xq):
        return (xq @ data.astype(jnp.bfloat16)) * scale

    @jax.jit
    def bf16_matmul(data, xq):
        return xq @ data

    t_fp8 = timeit(lambda: fp8_matmul(qw.data, qw.scale, xb))
    t_i8 = timeit(lambda: int8_matmul(w8i, s_i, xb))
    t_bf = timeit(lambda: bf16_matmul(wbf, xb))
    result.update(
        fp8_us=round(t_fp8 * 1e6, 1),
        int8_us=round(t_i8 * 1e6, 1),
        bf16_us=round(t_bf * 1e6, 1),
        fp8_vs_bf16=round(t_bf / t_fp8, 3),
        fp8_vs_int8=round(t_i8 / t_fp8, 3),
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
