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


def bench_score(model, params, batch, seq, iters=3):
    """Time one scoring forward over [batch, seq] tokens (logits only)."""
    fwd = jax.jit(lambda p, t: model.apply(p, t))
    tok0 = jnp.ones((batch, seq), jnp.int32)
    fwd(params, tok0).block_until_ready()
    best = float("inf")
    for i in range(iters):
        # Varied inputs defeat the tunnel's identical-arg memoization.
        tok = jnp.full((batch, seq), 2 + i, jnp.int32)
        t0 = time.perf_counter()
        fwd(params, tok).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return batch * seq / best  # prompt tokens/s


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

        model_fp, params_fp = build(cfg, "fp")
        tps_fp = bench_score(model_fp, params_fp, batch, seq)
        del params_fp

        for backend in backends:
            _ops.LINEAR_BACKEND = backend
            model_q, params_q = build(cfg, "dynamic")
            tps_q = bench_score(model_q, params_q, batch, seq)
            del params_q
            rec = {
                "metric": "prefill_speedup_int8_vs_bf16",
                "tokens": m_tokens,
                "backend": backend,
                "value": round(tps_q / tps_fp, 4),
                "toks_per_s": round(tps_q, 1),
                "toks_per_s_bf16": round(tps_fp, 1),
                "layers": layers,
            }
            print(json.dumps(rec), flush=True)
            results.append(rec)
    return 0


if __name__ == "__main__":
    sys.exit(main())
