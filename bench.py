"""Headline benchmark: decode tokens/s, dynamic-INT8 (+INT8 KV) vs bf16.

Prints ONE JSON line:
  {"metric": "decode_speedup_int8_vs_bf16", "value": N, "unit": "x",
   "vs_baseline": N}

vs_baseline is the measured speedup over the bf16 baseline divided by the
1.7x target from BASELINE.json:5 (>=1.0 means the target is met).

Model: Llama-7B-shaped layers (d=4096, I=11008, 32 q / 32 kv heads) with a
reduced layer count so one chip's compile+init budget stays sane; per-layer
arithmetic intensity and byte traffic match the 7B decode regime, so the
per-token speedup is representative. Batch 8, context 1024.

Env knobs: BENCH_LAYERS, BENCH_BATCH, BENCH_CTX, BENCH_STEPS, BENCH_MODE
(BENCH_MODE=weight_only benches the weight-only path instead).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def build(cfg, mode, kv_dtype, batch, ctx):
    from protoquant_tpu.models import LlamaModel, init_cache
    from protoquant_tpu.nn import quantize_params

    fp_model = LlamaModel(cfg, mode="fp", dtype=jnp.bfloat16)
    tokens = jnp.ones((1, 8), jnp.int32)
    with jax.default_device(jax.devices("cpu")[0]):
        fp_params = fp_model.init(jax.random.PRNGKey(0), tokens)
        if mode != "fp":
            params = quantize_params(fp_params)
        else:
            # Honest bf16 baseline: weights stored (and streamed from HBM)
            # in bf16, not f32.
            params = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if hasattr(a, "dtype") and a.dtype == jnp.float32 and a.ndim >= 2
                else a,
                fp_params,
            )
    params = jax.device_put(params, jax.devices()[0])
    model = LlamaModel(cfg, mode=mode, dtype=jnp.bfloat16)

    caches = init_cache(cfg, batch, ctx, kv_dtype=kv_dtype)
    # Pre-age every slot to ctx-64 so decode reads a realistic cache window.
    import dataclasses

    caches = [
        dataclasses.replace(c, lengths=jnp.full((batch,), ctx - 64, jnp.int32))
        for c in caches
    ]
    return model, params, caches


def bench_decode(model, params, caches, batch, steps):
    from functools import partial

    @partial(jax.jit, static_argnames=("m",), donate_argnums=(2,))
    def step(m, params, caches, tok):
        positions = caches[0].lengths[:, None]
        logits, caches = m.apply(params, tok, positions, caches)
        nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
        return nxt, caches

    tok = jnp.ones((batch, 1), jnp.int32)
    # Warmup / compile.
    tok, caches = step(model, params, caches, tok)
    tok.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(steps):
        tok, caches = step(model, params, caches, tok)
    tok.block_until_ready()
    dt = time.perf_counter() - t0
    return batch * steps / dt  # tokens/s


def main():
    from protoquant_tpu.utils.config import ModelConfig

    layers = int(os.environ.get("BENCH_LAYERS", "4"))
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    ctx = int(os.environ.get("BENCH_CTX", "1024"))
    steps = int(os.environ.get("BENCH_STEPS", "32"))
    mode = os.environ.get("BENCH_MODE", "dynamic")

    cfg = ModelConfig(
        vocab_size=32000,
        hidden_size=4096,
        intermediate_size=11008,
        num_hidden_layers=layers,
        num_attention_heads=32,
        num_key_value_heads=32,
        max_position_embeddings=ctx,
    )

    model_q, params_q, caches_q = build(cfg, mode, jnp.int8, batch, ctx)
    tps_q = bench_decode(model_q, params_q, caches_q, batch, steps)
    del params_q, caches_q

    model_fp, params_fp, caches_fp = build(cfg, "fp", jnp.bfloat16, batch, ctx)
    tps_fp = bench_decode(model_fp, params_fp, caches_fp, batch, steps)
    del params_fp, caches_fp

    speedup = tps_q / tps_fp
    print(
        json.dumps(
            {
                "metric": "decode_speedup_int8_vs_bf16",
                "value": round(speedup, 4),
                "unit": "x",
                "vs_baseline": round(speedup / 1.7, 4),
                "detail": {
                    "tokens_per_s_int8": round(tps_q, 2),
                    "tokens_per_s_bf16": round(tps_fp, 2),
                    "mode": mode,
                    "layers": layers,
                    "batch": batch,
                    "ctx": ctx,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
