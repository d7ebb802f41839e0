"""Medusa tree-speculation mechanics bench: cost of one tree tick vs one
plain decode step, fully on-device (rounds inside one lax.scan program).

A medusa tick = ONE target forward over the T = 1 + branches*depth node
window (ancestor mask) + acceptance + branch compaction (reorder_tail) +
the drafting heads on the accepted node's hidden state (next proposals).
It emits accepted+1 tokens, so medusa wins iff

    (E[accepted] + 1) / T_tick  >  1 / T_plain_step

Reports T_tick(J, d), T_plain_step, breakeven acceptance (fraction of the
depth that must be accepted), and the full-accept speedup ceiling. Uses the
engine's own scoring body (_tree_score_and_accept_body) so the measured
mechanics are the product path's, heads included at their real size
(depth x (D^2 + D*V) params — the vocab projections dominate).

Target = 7B-shaped 4-layer proxy (SPEC_* env overrides as spec_bench.py).
RTT-cancelled two-length differencing (BASELINE.md methodology).
"""

import dataclasses
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

    if os.environ.get("SPEC_PLATFORM"):  # e.g. cpu smoke runs
        jax.config.update("jax_platforms", os.environ["SPEC_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from protoquant_tpu.engine.engine import _tree_score_and_accept_body
    from protoquant_tpu.models import LlamaModel
    from protoquant_tpu.models.llama import init_cache
    from protoquant_tpu.models.medusa import init_medusa
    from protoquant_tpu.nn import quantize_params
    from protoquant_tpu.utils.config import ModelConfig, QuantConfig

    B = int(os.environ.get("SPEC_BATCH", "1"))
    J = int(os.environ.get("SPEC_BRANCHES", "3"))
    d = int(os.environ.get("SPEC_DEPTH", "3"))
    D = int(os.environ.get("SPEC_HIDDEN", "4096"))
    V = int(os.environ.get("SPEC_VOCAB", "32000"))
    S = 1024
    cfg = ModelConfig(
        vocab_size=V, hidden_size=D, intermediate_size=int(D * 2.6875),
        num_hidden_layers=int(os.environ.get("SPEC_LAYERS", "4")),
        num_attention_heads=max(1, D // 128),
        num_key_value_heads=max(1, D // 128),
        max_position_embeddings=S,
    )

    heads_mode = os.environ.get("SPEC_HEADS_MODE", "fp")
    heads_style = os.environ.get("SPEC_HEADS_STYLE", "medusa")
    model = LlamaModel(cfg, mode="dynamic", dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        fp = LlamaModel(cfg, mode="fp", dtype=jnp.bfloat16).init(
            jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
        params = quantize_params(fp, QuantConfig(mode="dynamic"))
        if heads_style == "hydra":
            from protoquant_tpu.models.medusa import init_hydra

            heads, head_params = init_hydra(
                model, d, jax.random.PRNGKey(1), mode=heads_mode)
        else:
            heads, head_params = init_medusa(
                model, d, jax.random.PRNGKey(1), mode=heads_mode)
    params = jax.device_put(params, jax.devices()[0])
    head_params = jax.device_put(head_params, jax.devices()[0])

    def make_state():
        caches = init_cache(cfg, B, S, kv_dtype=jnp.int8)
        caches = [dataclasses.replace(c, lengths=jnp.full((B,), 64, jnp.int32))
                  for c in caches]
        last = jnp.full((B,), 17, jnp.int32)
        props = jnp.zeros((B, J, d), jnp.int32)
        return caches, last, props

    active = jnp.ones((B,), bool)

    def medusa_tick(carry, i, ps, hps):
        caches, last, props = carry
        window = jnp.concatenate(
            [(last + (i % 3))[:, None] % (V - 1), props.reshape(B, J * d)], 1)
        best, accepted, corr, nprops, caches = _tree_score_and_accept_body(
            model, ps, caches, window, active, J, d,
            heads=heads, head_params=hps,
        )
        committed = jnp.minimum(
            caches[0].lengths * 0 + 64, S - J * d - 2)
        caches = [dataclasses.replace(c, lengths=committed) for c in caches]
        return (caches, corr, nprops), (accepted + 1).sum()

    def plain_step(carry, i, ps, hps):
        caches, last, props = carry
        tok = (last + (i % 5))[:, None] % (V - 1) + 1
        pos = caches[0].lengths[:, None]
        logits, caches = model.apply(ps, tok, pos, caches)
        committed = jnp.minimum(caches[0].lengths * 0 + 64, S - 2)
        caches = [dataclasses.replace(c, lengths=committed) for c in caches]
        last = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        return (caches, last, props), jnp.float32(1)

    def time_loop(name, body):
        # params/head_params thread through as jit ARGUMENTS — closing over
        # them bakes ~3GB of weights into the program as captured constants
        # (measured; the head vocab projections dominate).
        def make_run(n):
            @functools.partial(jax.jit, donate_argnums=(0,))
            def run(carry, salt, ps, hps):
                def wrapped(c, i):
                    return body(c, i + salt, ps, hps)

                carry, em = jax.lax.scan(wrapped, carry, jnp.arange(n))
                return jnp.sum(em.astype(jnp.float32)) + carry[1].sum()

            return run

        lo, hi = 16, 80
        run_lo, run_hi = make_run(lo), make_run(hi)
        float(run_lo(make_state(), jnp.int32(1), params, head_params))
        float(run_hi(make_state(), jnp.int32(1), params, head_params))
        bl = bh = 1e9
        for j in range(2, 5):
            c = make_state()
            t0 = time.perf_counter()
            float(run_lo(c, jnp.int32(j * 1009), params, head_params))
            bl = min(bl, time.perf_counter() - t0)
            c = make_state()
            t0 = time.perf_counter()
            float(run_hi(c, jnp.int32(j * 2027), params, head_params))
            bh = min(bh, time.perf_counter() - t0)
        dt = max(bh - bl, 1e-9) / (hi - lo)
        print(json.dumps({"case": name, "us": round(dt * 1e6, 1)}), flush=True)
        return dt

    t_tick = time_loop(f"medusa_tick_J{J}_d{d}", medusa_tick)
    t_plain = time_loop("plain_step", plain_step)
    need = t_tick / t_plain
    breakeven = max(0.0, (need - 1.0) / d)
    print(json.dumps({
        "metric": "medusa_mechanics", "branches": J, "depth": d, "batch": B,
        "heads_mode": heads_mode, "heads_style": heads_style,
        "t_tick_us": round(t_tick * 1e6, 1),
        "t_plain_us": round(t_plain * 1e6, 1),
        "tick_cost_in_plain_steps": round(need, 3),
        "breakeven_accept_frac": round(breakeven, 3),
        "speedup_at_full_accept": round((d + 1) / need, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
