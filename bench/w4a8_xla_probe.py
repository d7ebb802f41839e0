"""W4A8 XLA-materialized two-level probe (round 5 — VERDICT r4 item 9).

Question it answers: how much of the two_level kernel's gap to XLA's
full-int8 dot (1.30x vs 1.81x bf16 at model-level prefill) is Mosaic
pipeline maturity vs the formulation itself? The cheap untried probe:
requant the nibbles to int8 weights with XLA ELEMENTWISE ops (the same
two-level math the kernel runs in VMEM — column scale = max group scale,
ratio-requant to int8), materialize the int8 weight matrix, and run ONE
fused XLA int8 dot. At M=512 the extra int8 weight traffic (2x the packed
bytes, written + read back) may hide under the compute; wherever this
lands between the Pallas kernel and the prequantized-int8 anchor bounds
Mosaic's share of the gap.

Cases (all RTT-cancelled scan timing, weights mutated per step so the
requant cannot hoist out of the loop):
  w4a8_pallas_2l   — the product kernel (ops/w4a8_matmul, two_level)
  w4a8_xla_2l      — XLA requant -> materialized int8 weights -> int8 dot
  int8_anchor      — prequantized int8 weights, one XLA int8 dot (ceiling)
  bf16_anchor      — bf16 weights, bf16 dot (the denominator)

Env: M (512), NCOL (11008).
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

    from protoquant_tpu.core import numerics
    from protoquant_tpu.ops import w4a8_matmul

    M = int(os.environ.get("M", "512"))
    K = 4096
    # Default N matches bench/w4a8_sweep.py's 88064 (the 7B fused-column
    # width): at N=11008 the 16-step scan difference (~3ms) drowns in the
    # tunnel's ~50ms RTT noise floor — measured as an impossible >1 MXU
    # util before this was raised.
    N = int(os.environ.get("NCOL", "88064"))
    G = 128
    n_groups = K // G
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)) * 0.3, jnp.bfloat16)
    xq, sx = numerics.quantize_rowwise(x)
    xq, sx = jax.block_until_ready((xq, sx))
    packed0 = jnp.asarray(rng.integers(-128, 128, (K // 2, N), dtype=np.int8))
    scales = jnp.asarray(rng.uniform(0.01, 0.05, (n_groups, N)), jnp.float32)
    w8_0 = jnp.asarray(rng.integers(-127, 128, (K, N), dtype=np.int8))
    sw = jnp.asarray(rng.uniform(0.005, 0.02, (N,)), jnp.float32)
    wbf = (w8_0.astype(jnp.float32) * sw[None, :]).astype(jnp.bfloat16)
    flops = 2 * M * K * N

    # Two-level constants (the kernel's exact decomposition).
    scol = jnp.max(scales, axis=0, keepdims=True)
    r16 = scales * jnp.where(scol > 0, 16.0 / scol, 0.0)

    def mut_packed(w, i):
        return jax.lax.dynamic_update_slice(
            w, ((i % 5) + 1).astype(jnp.int8).reshape(1, 1),
            ((i * 13) % (K // 2), (i * 7) % N))

    def mut8(w, i):
        return jax.lax.dynamic_update_slice(
            w, ((i % 5) + 1).astype(jnp.int8).reshape(1, 1),
            ((i * 13) % K, (i * 7) % N))

    def pallas_2l(p):
        return w4a8_matmul(
            xq, sx, p, scales, group=G, out_dtype=jnp.bfloat16,
            formulation="two_level", interpret=False,
        )

    def xla_2l(p):
        # Unpack: packed row r of group t holds weight rows t*G + r (low
        # nibble) and t*G + G/2 + r (high) — the kernel's pack layout.
        u = p.astype(jnp.int32)
        lo = ((u << 28) >> 28).reshape(n_groups, G // 2, N)
        hi = ((u << 24) >> 28).reshape(n_groups, G // 2, N)
        nib = jnp.concatenate([lo, hi], axis=1)  # [n_groups, G, N]
        w8 = jnp.round(
            nib.astype(jnp.float32) * r16[:, None, :]
        ).astype(jnp.int8).reshape(K, N)
        acc = jax.lax.dot_general(
            xq, w8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = (acc.astype(jnp.float32) * (sx[:, None] * (1.0 / 16.0))
             * scol).astype(jnp.bfloat16)
        return y

    def int8_anchor(w):
        acc = jax.lax.dot_general(
            xq, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (acc.astype(jnp.float32) * sx[:, None] * sw[None, :]).astype(
            jnp.bfloat16)

    def bf16_anchor(w):
        xs = x  # bf16 activations
        return jax.lax.dot_general(
            xs, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    def timed(name, fn, w0, mut, peak):
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

        # Per-case step counts sized so the bracket DIFFERENCE is ~0.6s of
        # device time — far above the tunnel's ~50ms RTT jitter (fixed
        # 16/48 steps underflowed for the fast cases: a bf16 anchor read
        # an impossible >1 MXU util before this was adaptive).
        est_step = flops / (peak or BF16_TOPS) * 4.0  # ~4x off SoL guess
        lo_n = max(8, min(256, int(0.3 / max(est_step, 1e-5))))
        hi_n = 3 * lo_n
        run_lo, run_hi = make_run(lo_n), make_run(hi_n)
        float(run_lo(w0 + 0, jnp.int32(1)))
        float(run_hi(w0 + 0, jnp.int32(1)))
        bl = bh = 1e9
        for j in range(2, 5):
            t0 = time.perf_counter()
            float(run_lo(w0 + 0, jnp.int32(j * 1009)))
            bl = min(bl, time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(run_hi(w0 + 0, jnp.int32(j * 2027)))
            bh = min(bh, time.perf_counter() - t0)
        dt = max(bh - bl, 1e-9) / (hi_n - lo_n)
        rec = {"case": name, "M": M, "N": N, "us": round(dt * 1e6, 1)}
        if peak:
            rec["mxu_util"] = round(flops / dt / peak, 3)
        print(json.dumps(rec), flush=True)
        return dt

    t_p = timed("w4a8_pallas_2l", pallas_2l, packed0, mut_packed, INT8_TOPS)
    t_x = timed("w4a8_xla_2l", xla_2l, packed0, mut_packed, INT8_TOPS)
    t_8 = timed("int8_anchor", int8_anchor, w8_0, mut8, INT8_TOPS)
    t_b = timed("bf16_anchor", bf16_anchor, wbf,
                lambda w, i: jax.lax.dynamic_update_slice(
                    w, ((i % 5) + 1).astype(jnp.bfloat16).reshape(1, 1),
                    ((i * 13) % K, (i * 7) % N)), BF16_TOPS)
    print(json.dumps({
        "metric": "w4a8_two_level_formulation_ab", "M": M, "N": N,
        "pallas_vs_bf16": round(t_b / t_p, 3),
        "xla_vs_bf16": round(t_b / t_x, 3),
        "int8_anchor_vs_bf16": round(t_b / t_8, 3),
        # Measured verdict (BASELINE.md round-5 W4A8 decision record):
        # True = the materialized formulation lost to the Pallas kernel,
        # closing the "part of the gap is recoverable via XLA" hypothesis.
        "xla_materialized_dominated": bool(t_x > t_p),
    }), flush=True)


if __name__ == "__main__":
    main()
