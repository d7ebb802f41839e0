"""Model-level prefill/scoring benchmark: int8-dynamic vs bf16 at M >= 128.

The decode bench (bench.py) measures the memory-bound regime; this measures
the COMPUTE-bound regime where the int8 MXU rate (2x bf16 on v5e) is the
whole thesis (BASELINE.json:5 "speed-of-light... every dequant+matmul
kernel"; VERDICT round-1 items 1-2). A Llama-7B-shaped layer stack scores
[B, T] token batches (no KV cache — the pure scoring/prefill path) with
every projection through the selected linear backend.

Prints one JSON line per (tokens, backend) config:
  {"metric": "prefill_speedup_int8_vs_bf16", "tokens": M, "backend": ...,
   "value": speedup, "toks_per_s": N, "toks_per_s_bf16": N}

Env knobs: PREFILL_LAYERS (default 1), PREFILL_SHAPES (comma list of B*T
token counts, default "128,512,2048"), PREFILL_BACKENDS (default
"xla,pallas").
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np


def build(cfg, mode):
    from protoquant_tpu.models import LlamaModel
    from protoquant_tpu.nn import fuse_projections, quantize_params

    fp_model = LlamaModel(cfg, mode="fp", dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        fp_params = fp_model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
        fp_params = fuse_projections(fp_params)
        if mode != "fp":
            from protoquant_tpu.utils.config import QuantConfig

            params = quantize_params(fp_params, QuantConfig(mode=mode))
        else:
            params = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if hasattr(a, "dtype") and a.dtype == jnp.float32 and a.ndim >= 2
                else a,
                fp_params,
            )
    params = jax.device_put(params, jax.devices()[0])
    model = LlamaModel(cfg, mode=mode, dtype=jnp.bfloat16, fused=True)
    return model, params


_STEPS_ENV = os.environ.get("PREFILL_SCAN_STEPS", "")
# Per-program runtime is a narrow window on this tunnel: too short and the
# ~40-50ms transport RTT dominates; too LONG and the remote executor hangs
# outright (measured: a 2048-step scan, ~5s of real work, never returned
# its fetch — while 16..256-step versions of the same program are fine).
# Target ~0.3s of real work per program, assuming execution lands ~5x off
# SoL, and amortize RTT by chaining dispatches (see bench_score).
TARGET_SECONDS = float(os.environ.get("PREFILL_TARGET_SECONDS", "0.3"))


def scan_steps(sol_seconds_per_forward: float) -> int:
    if _STEPS_ENV:
        return int(_STEPS_ENV)
    want = TARGET_SECONDS / (5.0 * max(sol_seconds_per_forward, 1e-6))
    return max(16, min(256, int(want)))


def bench_score(model, params, batch, seq, vocab, n_steps, iters=3):
    """Time n_steps scoring forwards over distinct [batch, seq] token
    batches, the whole loop inside ONE jitted lax.scan program.

    Two tunnel landmines defeated (measured round 2): (a) per-call timings of
    single forwards come back 4-65x above the MXU speed of light — only
    whole-loop-in-one-program timings execute faithfully (same trick as
    bench.py's decode scan); (b) identical-argument executions are memoized
    ACROSS runs, so inputs are salted per process. Token inputs are generated
    on-device inside the scan (fold_in per step) so host->device transfer
    doesn't scale with n_steps."""

    @jax.jit
    def run(p, salt):
        def body(carry, i):
            key = jax.random.fold_in(jax.random.PRNGKey(0), salt + i)
            tok = jax.random.randint(key, (batch, seq), 1, vocab, jnp.int32)
            logits = model.apply(p, tok)
            # Consume EVERY logit through a nonlinearity: a carry that reads
            # only logits[0, -1, :8] lets XLA slice the whole forward down to
            # the final position (q/o/MLP matmuls DCE'd at T-1 of T positions,
            # 99.98% of lm_head gone) — measured as "3000x above MXU speed of
            # light" before this fix. logsumexp over all axes is not
            # algebraically collapsible through the matmuls.
            return carry + jax.nn.logsumexp(logits.astype(jnp.float32)), ()

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n_steps))
        return acc

    # Timing MUST force a host fetch: on this tunnel block_until_ready() can
    # return without waiting for execution (measured: a scan whose first
    # float() fetch took 113s "blocked ready" in 0.15s), so only the
    # scalar materialization below is a real synchronization point. Each
    # bracket chains `chain` dispatches (distinct salts; the device executes
    # them back-to-back on one stream) and fetches only the last, amortizing
    # the per-fetch RTT across the chain.
    chain = 3
    salt0 = (os.getpid() * 7919 + int(time.time() * 1000)) % 2**20
    float(run(params, jnp.int32(salt0)))  # warmup: compile + execute + fetch
    best = float("inf")
    for k in range(1, iters + 1):
        salts = [jnp.int32(salt0 + (k << 20) + (j << 26)) for j in range(chain)]
        t0 = time.perf_counter()
        out = [run(params, s) for s in salts]
        float(out[-1])
        best = min(best, time.perf_counter() - t0)
    return chain * n_steps * batch * seq / best  # prompt tokens/s


def linear_flops(cfg, m_tokens):
    """2*M*P over the matmul params (the compute-bound floor)."""
    d, i = cfg.hidden_size, cfg.intermediate_size
    kvd = cfg.num_key_value_heads * cfg.head_dim
    per_layer = d * d * 2 + d * kvd * 2 + d * i * 3  # q,o + k,v + gate/up/down
    p = cfg.num_hidden_layers * per_layer + d * cfg.vocab_size
    return 2.0 * m_tokens * p


V5E_INT8_TOPS = 394e12
V5E_BF16_FLOPS = 197e12


def main():
    from protoquant_tpu.utils.config import ModelConfig

    layers = int(os.environ.get("PREFILL_LAYERS", "1"))
    shapes = [int(s) for s in os.environ.get("PREFILL_SHAPES", "128,512,2048").split(",")]
    backends = os.environ.get("PREFILL_BACKENDS", "xla,pallas").split(",")
    modes = os.environ.get("PREFILL_MODES", "dynamic").split(",")
    # W8A8-static is an XLA-formulation mode (static_qlinear_xla); the
    # perf path never routes it through the Pallas contract kernel.
    runs = [
        (mode, backend)
        for mode in modes
        for backend in (backends if mode == "dynamic" else ["xla"])
    ]

    import protoquant_tpu.ops as _ops

    cfg = ModelConfig(
        vocab_size=32000,
        hidden_size=4096,
        intermediate_size=11008,
        num_hidden_layers=layers,
        num_attention_heads=32,
        num_key_value_heads=32,
        max_position_embeddings=4096,
    )

    results = []
    for m_tokens in shapes:
        batch, seq = (1, m_tokens) if m_tokens <= 2048 else (m_tokens // 2048, 2048)
        flops = linear_flops(cfg, m_tokens)
        sol_bf16 = flops / V5E_BF16_FLOPS  # fastest physically possible
        sol_int8 = flops / V5E_INT8_TOPS

        n_steps = scan_steps(sol_bf16)

        model_fp, params_fp = build(cfg, "fp")
        tps_fp = bench_score(model_fp, params_fp, batch, seq, cfg.vocab_size, n_steps)
        del params_fp
        t_fp = m_tokens / tps_fp

        for mode, backend in runs:
            _ops.LINEAR_BACKEND = backend
            model_q, params_q = build(cfg, mode)
            tps_q = bench_score(
                model_q, params_q, batch, seq, cfg.vocab_size, n_steps
            )
            del params_q
            t_q = m_tokens / tps_q
            # Credibility: a measured time below the MXU speed-of-light for
            # these FLOPs means the tunnel did not faithfully execute
            # (memoization / unfaithful large-program execution).
            credible = t_fp >= 0.9 * sol_bf16 and t_q >= 0.9 * sol_int8
            rec = {
                "metric": "prefill_speedup_int8_vs_bf16",
                "tokens": m_tokens,
                "mode": mode,
                "backend": backend,
                "value": round(tps_q / tps_fp, 4),
                "toks_per_s": round(tps_q, 1),
                "toks_per_s_bf16": round(tps_fp, 1),
                "mxu_util_int8": round(sol_int8 / t_q, 3),
                "mxu_util_bf16": round(sol_bf16 / t_fp, 3),
                "credible_on_real_hw": bool(credible),
                "layers": layers,
                "scan_steps": n_steps,
            }
            print(json.dumps(rec), flush=True)
            results.append(rec)
    return 0


if __name__ == "__main__":
    sys.exit(main())
