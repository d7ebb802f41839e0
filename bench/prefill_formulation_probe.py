"""One-off probe: which formulation of the int8 prefill GEMM is fastest on
this chip? Candidates, same int8 HBM traffic:

  pallas   — ops.qmatmul (auto blocks, int32 VMEM acc, fused epilogue)
  bf16lane — int8 operands cast to bf16, f32 acc (ops.dynamic_qlinear_xla's
             dot; XLA may pattern-match this back onto the int8 MXU)
  s8native — jnp.matmul(xq, wq, preferred_element_type=int32) + f32 epilogue
             (the literal int8 MXU dot, compiler-scheduled)

Methodology: scan-in-one-program + chained salted dispatches (BASELINE.md
"Timing methodology").
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

import numpy as np

from kernel_bench import scan_time, V5E_HBM_GBS, V5E_INT8_TOPS


def main():
    import jax.numpy as jnp

    from protoquant_tpu import ops

    shapes = [
        (512, 4096, 4096),
        (512, 4096, 11008),
        (512, 11008, 4096),
        (2048, 4096, 4096),
    ]
    rng = np.random.default_rng(0)
    for m, k, n in shapes:
        xq = jnp.asarray(rng.integers(-126, 126, (m, k), dtype=np.int8))
        wq = jnp.asarray(rng.integers(-127, 128, (k, n), dtype=np.int8))
        s_x = jnp.ones((m,), jnp.float32)
        s_w = jnp.ones((n,), jnp.float32)
        flops = 2 * m * k * n
        sol = max(flops / (V5E_INT8_TOPS * 1e12),
                  (m * k + k * n + 2 * m * n) / (V5E_HBM_GBS * 1e9))
        iters = int(max(16, min(2048, 0.25 / (3 * sol))))

        def f_pallas(a):
            return ops.qmatmul(a, wq, s_x, s_w, out_dtype=jnp.bfloat16)

        def f_bf16lane(a):
            acc = jnp.matmul(a.astype(jnp.bfloat16), wq.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            return (acc * s_x[:, None] * s_w[None, :]).astype(jnp.bfloat16)

        def f_s8native(a):
            acc = jnp.matmul(a, wq, preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * s_x[:, None] * s_w[None, :]).astype(
                jnp.bfloat16
            )

        out = {"shape": f"{m}x{k}x{n}", "iters": iters}
        for name, fn in [("pallas", f_pallas), ("bf16lane", f_bf16lane),
                         ("s8native", f_s8native)]:
            dt = scan_time(fn, xq, iters, int_vary=True)
            out[name + "_us"] = round(dt * 1e6, 1)
            out[name + "_tops"] = round(flops / dt / 1e12, 1)
            out[name + "_util"] = round(flops / dt / 1e12 / V5E_INT8_TOPS, 3)
        print(out, flush=True)


if __name__ == "__main__":
    main()
