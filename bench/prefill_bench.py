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


SCAN_STEPS = int(os.environ.get("PREFILL_SCAN_STEPS", "8"))


def bench_score(model, params, batch, seq, vocab, iters=3):
    """Time SCAN_STEPS scoring forwards over distinct [batch, seq] token
    batches, the whole loop inside ONE jitted lax.scan program.

    Two tunnel landmines defeated (measured this session): (a) per-call
    timings of single forwards come back 4-65x above the MXU speed of light
    — only whole-loop-in-one-program timings execute faithfully (same trick
    as bench.py's decode scan); (b) identical-argument executions are
    memoized ACROSS runs, so inputs are salted per process."""

    @jax.jit
    def run(p, toks):  # toks: [N, batch, seq]
        def body(carry, tok):
            logits = model.apply(p, tok)
            # Data dependence between steps prevents reordering/elision.
            return carry + logits[0, -1, :8].astype(jnp.float32), ()

        acc, _ = jax.lax.scan(body, jnp.zeros((8,), jnp.float32), toks)
        return acc

    salt = (os.getpid() * 7919 + int(time.time() * 1000)) % (vocab - 8)
    rng = np.random.default_rng(salt)
    mk = lambda: jnp.asarray(
        rng.integers(1, vocab, (SCAN_STEPS, batch, seq)), jnp.int32
    )
    run(params, mk()).block_until_ready()
    best = float("inf")
    for _ in range(iters):
        toks = mk()
        t0 = time.perf_counter()
        run(params, toks).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return SCAN_STEPS * batch * seq / best  # prompt tokens/s


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

        model_fp, params_fp = build(cfg, "fp")
        tps_fp = bench_score(model_fp, params_fp, batch, seq, cfg.vocab_size)
        del params_fp
        t_fp = m_tokens / tps_fp

        for backend in backends:
            _ops.LINEAR_BACKEND = backend
            model_q, params_q = build(cfg, "dynamic")
            tps_q = bench_score(model_q, params_q, batch, seq, cfg.vocab_size)
            del params_q
            t_q = m_tokens / tps_q
            # Credibility: a measured time below the MXU speed-of-light for
            # these FLOPs means the tunnel did not faithfully execute
            # (memoization / unfaithful large-program execution).
            credible = t_fp >= 0.9 * sol_bf16 and t_q >= 0.9 * sol_int8
            rec = {
                "metric": "prefill_speedup_int8_vs_bf16",
                "tokens": m_tokens,
                "backend": backend,
                "value": round(tps_q / tps_fp, 4),
                "toks_per_s": round(tps_q, 1),
                "toks_per_s_bf16": round(tps_fp, 1),
                "mxu_util_int8": round(sol_int8 / t_q, 3),
                "mxu_util_bf16": round(sol_bf16 / t_fp, 3),
                "credible_on_real_hw": bool(credible),
                "layers": layers,
            }
            print(json.dumps(rec), flush=True)
            results.append(rec)
    return 0


if __name__ == "__main__":
    sys.exit(main())
