"""Speculative-decode mechanics bench: cost of one spec round vs one plain
decode step, fully on-device (rounds inside one lax.scan program).

A spec round = gamma draft decode steps + ONE batched target forward over
the (gamma+1)-token window + acceptance/rewind bookkeeping. It emits
accepted+1 tokens. Speculation wins iff

    (E[accepted] + 1) / T_round  >  1 / T_plain_step

so this bench reports T_round(gamma), T_plain_step, and the breakeven
acceptance  a* = gamma * (T_round / (T_plain * (gamma+1)) - 1/(gamma+1))
... printed directly as `breakeven_accept_frac` (fraction of gamma drafts
that must be accepted). Uses the engine's own jitted pieces
(_draft_propose / _spec_score_and_accept) so the measured mechanics are the
product path's. Target = 7B-shaped 4-layer proxy; draft = 1-layer d=1024.

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

    from protoquant_tpu.engine.engine import _draft_propose, _spec_score_and_accept
    from protoquant_tpu.models import LlamaModel
    from protoquant_tpu.models.llama import init_cache
    from protoquant_tpu.nn import quantize_params
    from protoquant_tpu.utils.config import ModelConfig, QuantConfig

    B = int(os.environ.get("SPEC_BATCH", "1"))
    gamma = int(os.environ.get("SPEC_GAMMA", "4"))
    D = int(os.environ.get("SPEC_HIDDEN", "4096"))
    V = int(os.environ.get("SPEC_VOCAB", "32000"))
    S = 1024
    tgt_cfg = ModelConfig(
        vocab_size=V, hidden_size=D, intermediate_size=int(D * 2.6875),
        num_hidden_layers=int(os.environ.get("SPEC_LAYERS", "4")),
        num_attention_heads=max(1, D // 128),
        num_key_value_heads=max(1, D // 128),
        max_position_embeddings=S,
    )
    drf_cfg = dataclasses.replace(
        tgt_cfg, hidden_size=D // 4, intermediate_size=int(D * 2.6875) // 4,
        num_hidden_layers=1, num_attention_heads=max(1, D // 512),
        num_key_value_heads=max(1, D // 512),
    )

    def build(cfg):
        model = LlamaModel(cfg, mode="dynamic", dtype=jnp.bfloat16)
        with jax.default_device(jax.devices("cpu")[0]):
            fp = LlamaModel(cfg, mode="fp", dtype=jnp.bfloat16).init(
                jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
            params = quantize_params(fp, QuantConfig(mode="dynamic"))
        return model, jax.device_put(params, jax.devices()[0])

    t_model, t_params = build(tgt_cfg)
    d_model, d_params = build(drf_cfg)

    def make_state():
        t_caches = init_cache(tgt_cfg, B, S, kv_dtype=jnp.int8)
        d_caches = init_cache(drf_cfg, B, S, kv_dtype=jnp.int8)
        t_caches = [dataclasses.replace(c, lengths=jnp.full((B,), 64, jnp.int32))
                    for c in t_caches]
        d_caches = [dataclasses.replace(c, lengths=jnp.full((B,), 64, jnp.int32))
                    for c in d_caches]
        last = jnp.full((B,), 17, jnp.int32)
        return t_caches, d_caches, last

    active = jnp.ones((B,), bool)

    def spec_round(carry, i):
        t_caches, d_caches, last = carry
        proposals, d_caches = _draft_propose(
            d_model, d_params, d_caches, last + (i % 3), active, gamma)
        window = jnp.concatenate([last[:, None], proposals], axis=1)
        greedy, accepted, t_caches = _spec_score_and_accept(
            t_model, t_params, t_caches, window, active)
        # Rewind: keep lengths bounded so the scan can run many rounds.
        committed = jnp.minimum(t_caches[0].lengths * 0 + 64, S - gamma - 2)
        t_caches = [dataclasses.replace(c, lengths=committed) for c in t_caches]
        d_caches = [dataclasses.replace(c, lengths=committed + 0) for c in d_caches]
        last = window[jnp.arange(B), jnp.minimum(accepted, gamma)]
        return (t_caches, d_caches, last), (accepted + 1).sum()

    def plain_step(carry, i):
        t_caches, d_caches, last = carry
        tok = (last + (i % 5))[:, None] % 31999 + 1
        pos = t_caches[0].lengths[:, None]
        logits, t_caches = t_model.apply(t_params, tok, pos, t_caches)
        committed = jnp.minimum(t_caches[0].lengths * 0 + 64, S - 2)
        t_caches = [dataclasses.replace(c, lengths=committed) for c in t_caches]
        last = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        return (t_caches, d_caches, last), jnp.float32(1)

    def time_loop(name, body):
        def make_run(n):
            @functools.partial(jax.jit, donate_argnums=(0,))
            def run(carry, salt):
                def wrapped(c, i):
                    return body(c, i + salt)

                carry, em = jax.lax.scan(wrapped, carry, jnp.arange(n))
                return jnp.sum(em.astype(jnp.float32)) + carry[2].sum()

            return run

        lo, hi = 16, 80
        run_lo, run_hi = make_run(lo), make_run(hi)
        float(run_lo(make_state(), jnp.int32(1)))
        float(run_hi(make_state(), jnp.int32(1)))
        bl = bh = 1e9
        for j in range(2, 5):
            c = make_state()
            t0 = time.perf_counter()
            float(run_lo(c, jnp.int32(j * 1009)))
            bl = min(bl, time.perf_counter() - t0)
            c = make_state()
            t0 = time.perf_counter()
            float(run_hi(c, jnp.int32(j * 2027)))
            bh = min(bh, time.perf_counter() - t0)
        dt = max(bh - bl, 1e-9) / (hi - lo)
        print(json.dumps({"case": name, "us": round(dt * 1e6, 1)}), flush=True)
        return dt

    t_round = time_loop(f"spec_round_g{gamma}", spec_round)
    t_plain = time_loop("plain_step", plain_step)
    # Tokens/round needed to match plain throughput: t_round / t_plain.
    need = t_round / t_plain
    breakeven = max(0.0, (need - 1.0) / gamma)
    print(json.dumps({
        "metric": "speculative_mechanics", "gamma": gamma, "batch": B,
        "t_round_us": round(t_round * 1e6, 1),
        "t_plain_us": round(t_plain * 1e6, 1),
        "round_cost_in_plain_steps": round(need, 3),
        "breakeven_accept_frac": round(breakeven, 3),
        "speedup_at_full_accept": round((gamma + 1) / need, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
