"""Headline benchmark: decode tokens/s, dynamic-INT8 (+INT8 KV) vs bf16.

Prints ONE JSON line:
  {"metric": "decode_speedup_int8_vs_bf16", "value": N, "unit": "x",
   "vs_baseline": N}

vs_baseline is the measured speedup over the bf16 baseline divided by the
1.7x target from BASELINE.json:5 (>=1.0 means the target is met).

Model: Llama-7B-shaped layers (d=4096, I=11008, 32 q / 32 kv heads) with a
reduced layer count so one chip's compile+init budget stays sane; per-layer
arithmetic intensity and byte traffic match the 7B decode regime, so the
per-token speedup is representative. Defaults (the measured-best honest
config on this chip): batch 8, context 512, 256 decode steps per timed call,
XLA-fused backends, fused QKV/gate-up on BOTH sides.

Env knobs: BENCH_LAYERS, BENCH_BATCH, BENCH_CTX, BENCH_STEPS, BENCH_MODE
(weight_only | weight_only_int4 | dynamic), BENCH_LINEAR_BACKEND and
BENCH_ATTENTION_BACKEND (auto | pallas | xla; default auto = the product
routing — head-blocked Pallas flash attention + in-place scatter on TPU).
"""

import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def _tunnel_health_guard(timeout_s: int = 240):
    """Fail fast (with a well-formed JSON line) instead of hanging forever
    when the axon TPU tunnel is wedged.

    Measured failure mode on this environment: a wedged tunnel blocks INSIDE
    ``import jax`` (the sitecustomize PJRT registration dials the relay and
    never returns), so no in-process timeout can help — probe from a
    SUBPROCESS with a hard timeout before this process ever imports jax.
    Skippable via BENCH_SKIP_HEALTH_GUARD=1 (e.g. off-TPU CPU runs)."""
    if os.environ.get("BENCH_SKIP_HEALTH_GUARD") == "1":
        return
    probe = (
        "import jax, jax.numpy as jnp;"
        "print(float(jnp.sum(jnp.ones((64,64), jnp.bfloat16)"
        " @ jnp.ones((64,64), jnp.bfloat16))))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", probe],
            timeout=timeout_s,
            capture_output=True,
        )
        ok = r.returncode == 0
    except subprocess.TimeoutExpired:
        ok = False
    if not ok:
        print(
            json.dumps(
                {
                    "metric": "decode_speedup_int8_vs_bf16",
                    "value": 0.0,
                    "unit": "x",
                    "vs_baseline": 0.0,
                    "error": (
                        "TPU runtime unreachable: device probe did not "
                        f"complete within {timeout_s}s (wedged axon tunnel); "
                        "no measurement possible this run"
                    ),
                }
            )
        )
        sys.exit(0)


_tunnel_health_guard()

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np


def build(cfg, mode, batch, ctx):
    from protoquant_tpu.models import LlamaModel
    from protoquant_tpu.nn import quantize_params

    from protoquant_tpu.nn import fuse_projections

    fp_model = LlamaModel(cfg, mode="fp", dtype=jnp.bfloat16)
    tokens = jnp.ones((1, 8), jnp.int32)
    with jax.default_device(jax.devices("cpu")[0]):
        fp_params = fp_model.init(jax.random.PRNGKey(0), tokens)
        # Fused QKV / gate-up for BOTH sides (fair: the baseline benefits
        # from fusion exactly as much as the quantized model).
        fp_params = fuse_projections(fp_params)
        if mode != "fp":
            from protoquant_tpu.utils.config import QuantConfig

            params = quantize_params(
                fp_params,
                QuantConfig(
                    mode=mode,
                    int4_storage=os.environ.get("BENCH_INT4_STORAGE", "packed"),
                ),
            )
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
    model = LlamaModel(
        cfg,
        mode=mode,
        dtype=jnp.bfloat16,
        fused=True,
        int4_storage=os.environ.get("BENCH_INT4_STORAGE", "packed"),
    )
    return model, params


def bench_decode(model, params, kv_dtype, batch, ctx, steps):
    """Tokens/s for `steps` decode iterations, whole loop on-device.

    Caches are built (and pre-aged to a realistic fill) *inside* the jit and
    the step loop is a lax.scan, so one host dispatch covers the full run —
    nothing but the generated tokens crosses the host boundary.
    """
    import dataclasses
    from functools import partial

    from protoquant_tpu.models import init_cache

    @partial(jax.jit, static_argnames=("m", "n_steps"))
    def run(m, params, tok0, n_steps):
        caches = init_cache(m.cfg, batch, ctx, kv_dtype=kv_dtype)
        # Pre-age so the run ends exactly at a full window (no slot overflow:
        # every decode step writes a real cache position).
        age = max(0, ctx - n_steps - 1)
        caches = [
            dataclasses.replace(c, lengths=jnp.full((batch,), age, jnp.int32))
            for c in caches
        ]

        def body(carry, _):
            tok, caches = carry
            positions = caches[0].lengths[:, None]
            logits, caches = m.apply(params, tok, positions, caches)
            nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
            return (nxt, caches), nxt[:, 0]

        (_, _), toks = jax.lax.scan(body, (tok0, caches), None, length=n_steps)
        return toks

    # Warmup MUST fetch to host: on this tunnel block_until_ready() returns
    # early while the background compile is still in flight (measured: a
    # program whose first fetch took 113s "blocked ready" in 0.15s). After
    # the executable exists, block/fetch agree — so force the compile to
    # completion with a real fetch before any timing.
    np.asarray(run(model, params, jnp.ones((batch, 1), jnp.int32), steps))
    # Timed calls use distinct real inputs: the tunnel can memoize
    # identical-argument executions, which corrupts repeat-call timing.
    # Each bracket chains `chain` dispatches (device executes them
    # back-to-back on one stream) and fetches only the last, so the ~50ms
    # per-fetch tunnel RTT is amortized over the whole chain.
    chain = 4
    best = float("inf")
    for i in range(3):
        toks = [
            jnp.full((batch, 1), 2 + chain * i + j, jnp.int32)
            for j in range(chain)
        ]
        t0 = time.perf_counter()
        out = [run(model, params, t, steps) for t in toks]
        np.asarray(out[-1])
        best = min(best, time.perf_counter() - t0)
    return chain * batch * steps / best  # tokens/s


def main():
    from protoquant_tpu.utils.config import ModelConfig

    layers = int(os.environ.get("BENCH_LAYERS", "1"))
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    ctx = int(os.environ.get("BENCH_CTX", "512"))
    steps = int(os.environ.get("BENCH_STEPS", "256"))
    mode = os.environ.get("BENCH_MODE", "dynamic")

    # Backend selection (see ops.LINEAR_BACKEND / kv_cache.ATTENTION_BACKEND).
    # "auto" = the measured-table routing (ops.resolve_linear_backend): XLA
    # formulations for every linear GEMM on this hardware — XLA places int8
    # dots on the MXU at roofline-class utilization and fuses at decode,
    # where each pallas_call carries per-invocation overhead (BASELINE.md
    # formulation probe; docs/ARCHITECTURE.md).
    import protoquant_tpu.ops as _ops
    from protoquant_tpu.models import kv_cache as _kv

    _ops.LINEAR_BACKEND = os.environ.get("BENCH_LINEAR_BACKEND", "auto")
    _kv.ATTENTION_BACKEND = os.environ.get("BENCH_ATTENTION_BACKEND", "auto")

    def measure(n_layers):
        cfg = ModelConfig(
            vocab_size=32000,
            hidden_size=4096,
            intermediate_size=11008,
            num_hidden_layers=n_layers,
            num_attention_heads=32,
            num_key_value_heads=32,
            max_position_embeddings=ctx,
        )
        model_q, params_q = build(cfg, mode, batch, ctx)
        tps_q = bench_decode(model_q, params_q, jnp.int8, batch, ctx, steps)
        del params_q
        model_fp, params_fp = build(cfg, "fp", batch, ctx)
        tps_fp = bench_decode(
            model_fp, params_fp, jnp.bfloat16, batch, ctx, steps
        )
        del params_fp
        return tps_q, tps_fp

    tps_q, tps_fp = measure(layers)
    speedup = tps_q / tps_fp

    # Deeper-proxy companion number (VERDICT r4 item 10): the 1-layer proxy
    # overweights lm_head relative to a real 7B stack (BASELINE.md measures
    # 2.44x at 1 layer vs 2.00x at 4); a 4-layer proxy dilutes lm_head 4x
    # toward the real-model share. Report both so the headline cannot lean
    # on the flattering proxy alone.
    proxy_layers = int(os.environ.get("BENCH_PROXY_LAYERS", "4"))
    detail = {
        "tokens_per_s_int8": round(tps_q, 2),
        "tokens_per_s_bf16": round(tps_fp, 2),
        "mode": mode,
        "linear_backend": _ops.LINEAR_BACKEND,
        "attention_backend": _kv.ATTENTION_BACKEND,
        "layers": layers,
        "batch": batch,
        "ctx": ctx,
        "device": str(jax.devices()[0]),
    }
    rec = {
        "metric": "decode_speedup_int8_vs_bf16",
        "value": round(speedup, 4),
        "unit": "x",
        "vs_baseline": round(speedup / 1.7, 4),
        "detail": detail,
    }
    if proxy_layers and proxy_layers != layers:
        try:
            tps_q4, tps_fp4 = measure(proxy_layers)
            rec[f"value_{proxy_layers}layer"] = round(tps_q4 / tps_fp4, 4)
            detail[f"tokens_per_s_int8_{proxy_layers}l"] = round(tps_q4, 2)
            detail[f"tokens_per_s_bf16_{proxy_layers}l"] = round(tps_fp4, 2)
        except Exception as e:  # headline must still print on proxy failure
            rec[f"value_{proxy_layers}layer_error"] = str(e)[:200]
    print(json.dumps(rec))


if __name__ == "__main__":
    sys.exit(main())
