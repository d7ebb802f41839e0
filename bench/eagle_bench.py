"""EAGLE speculation mechanics bench: cost of one EAGLE tick vs one plain
decode step, fully on-device (rounds inside one lax.scan program).

An EAGLE tick = gamma sequential ONE-LAYER draft forwards (each a fused
2D->D projection + one decoder layer over the draft's own KV cache + a
D x V vocab projection) + ONE target scoring forward over the gamma+1
window (the same rejection-sampling accept program as draft-model
speculation, returning the committed-frontier hidden anchor). It emits
accepted+1 tokens, so EAGLE wins iff

    (E[accepted] + 1) / T_tick  >  1 / T_plain_step

Reports T_tick(gamma), T_plain_step, breakeven acceptance (fraction of
gamma that must be accepted), and the full-accept speedup ceiling. Uses
the engine's own programs (_eagle_propose + _spec_score_and_accept_hidden)
so the measured mechanics are the product path's. NOTE the draft's vocab
projection (D x V) is a real cost per proposal — on the 4-layer proxy it
rivals a layer, on a real-depth target it is ~1/L of a step; scale
SPEC_LAYERS accordingly when reading breakeven.

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

    from protoquant_tpu.engine.engine import (
        _eagle_propose,
        _eagle_propose_tree,
        _eagle_tree_select,
        _spec_score_and_accept_hidden,
        _tree_score_and_accept_hidden,
    )
    from protoquant_tpu.models import LlamaModel
    from protoquant_tpu.models.eagle import _draft_cfg, init_eagle
    from protoquant_tpu.models.llama import init_cache
    from protoquant_tpu.nn import quantize_params
    from protoquant_tpu.utils.config import ModelConfig, QuantConfig

    B = int(os.environ.get("SPEC_BATCH", "1"))
    g = int(os.environ.get("SPEC_GAMMA", "4"))
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
    draft_mode = os.environ.get("SPEC_DRAFT_MODE", "dynamic")

    model = LlamaModel(cfg, mode="dynamic", dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        fp = LlamaModel(cfg, mode="fp", dtype=jnp.bfloat16).init(
            jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
        params = quantize_params(fp, QuantConfig(mode="dynamic"))
        draft, dparams = init_eagle(
            model, jax.random.PRNGKey(1), mode=draft_mode, base_params=fp)
        emb = fp["params"]["embed_tokens"]["embedding"]
    params = jax.device_put(params, jax.devices()[0])
    dparams = jax.device_put(dparams, jax.devices()[0])
    emb = jax.device_put(emb, jax.devices()[0])

    samp = {
        "temps": jnp.zeros((B,), jnp.float32),
        "top_ks": jnp.zeros((B,), jnp.int32),
        "top_ps": jnp.ones((B,), jnp.float32),
        "min_ps": jnp.zeros((B,), jnp.float32),
        "pres_pens": jnp.zeros((B,), jnp.float32),
        "freq_pens": jnp.zeros((B,), jnp.float32),
    }
    active = jnp.ones((B,), bool)

    def make_state():
        caches = init_cache(cfg, B, S, kv_dtype=jnp.int8)
        caches = [dataclasses.replace(c, lengths=jnp.full((B,), 64, jnp.int32))
                  for c in caches]
        dcache = init_cache(_draft_cfg(cfg), B, S, kv_dtype=jnp.int8)[0]
        dcache = dataclasses.replace(
            dcache, lengths=jnp.full((B,), 64, jnp.int32))
        last = jnp.full((B,), 17, jnp.int32)
        feats = jnp.zeros((B, D), jnp.float32)
        return caches, dcache, last, feats

    def eagle_tick(carry, i, ps, dps, et):
        caches, dcache, last, feats = carry
        key = jax.random.fold_in(jax.random.PRNGKey(7), i)
        props, dlogits, dcache = _eagle_propose(
            draft, dps, dcache, feats, (last + (i % 3)) % (V - 1), et,
            active, key, samp, g,
        )
        window = jnp.concatenate([last[:, None], props], axis=1)
        corr, accepted, h_next, caches = _spec_score_and_accept_hidden(
            model, ps, caches, window, active, key, samp, dlogits,
        )
        committed = jnp.minimum(caches[0].lengths * 0 + 64, S - g - 2)
        caches = [dataclasses.replace(c, lengths=committed) for c in caches]
        dcache = dataclasses.replace(dcache, lengths=committed)
        last = jnp.take_along_axis(corr, accepted[:, None], 1)[:, 0]
        return (caches, dcache, last, h_next), (accepted + 1).sum()

    def plain_step(carry, i, ps, dps, et):
        caches, dcache, last, feats = carry
        tok = (last + (i % 5))[:, None] % (V - 1) + 1
        pos = caches[0].lengths[:, None]
        logits, caches = model.apply(ps, tok, pos, caches)
        committed = jnp.minimum(caches[0].lengths * 0 + 64, S - 2)
        caches = [dataclasses.replace(c, lengths=committed) for c in caches]
        last = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        return (caches, dcache, last, feats), jnp.float32(1)

    def time_loop(name, body):
        # params AND the embedding table thread through as jit ARGUMENTS
        # (closing over them bakes the weights in as constants — the
        # tunnel's remote_compile rejects the 500MB program with HTTP 413;
        # see medusa_bench for the same trap).
        def make_run(n):
            @functools.partial(jax.jit, donate_argnums=(0,))
            def run(carry, salt, ps, dps, et):
                def wrapped(c, i):
                    return body(c, i + salt, ps, dps, et)

                carry, em = jax.lax.scan(wrapped, carry, jnp.arange(n))
                return jnp.sum(em.astype(jnp.float32)) + carry[2].sum()

            return run

        lo, hi = 16, 48
        run_lo, run_hi = make_run(lo), make_run(hi)
        float(run_lo(make_state(), jnp.int32(1), params, dparams, emb))
        float(run_hi(make_state(), jnp.int32(1), params, dparams, emb))
        bl = bh = 1e9
        for j in range(2, 5):
            c = make_state()
            t0 = time.perf_counter()
            float(run_lo(c, jnp.int32(j * 1009), params, dparams, emb))
            bl = min(bl, time.perf_counter() - t0)
            c = make_state()
            t0 = time.perf_counter()
            float(run_hi(c, jnp.int32(j * 2027), params, dparams, emb))
            bh = min(bh, time.perf_counter() - t0)
        dt = max(bh - bl, 1e-9) / (hi - lo)
        print(json.dumps({"case": name, "us": round(dt * 1e6, 1)}), flush=True)
        return dt

    # EAGLE-TREE tick (round 5): J-branch expansion through the one-forward
    # tree scorer + winning-branch cache selection — the engine's
    # _eagle_tree_tick data path end-to-end.
    J = int(os.environ.get("SPEC_BRANCHES", "3"))

    def eagle_tree_tick(carry, i, ps, dps, et):
        caches, dcache, last, feats = carry
        key = jax.random.fold_in(jax.random.PRNGKey(7), i)
        props, cache_rep = _eagle_propose_tree(
            draft, dps, dcache, feats, (last + (i % 3)) % (V - 1), et,
            active, branches=J, depth=g,
        )
        window = jnp.concatenate(
            [last[:, None], props.reshape(B, J * g)], axis=1
        )
        best, accepted, corr, h_corr, caches = _tree_score_and_accept_hidden(
            model, ps, caches, window, active, key, samp,
            branches=J, depth=g,
        )
        dcache = _eagle_tree_select(cache_rep, best, J)
        committed = jnp.minimum(caches[0].lengths * 0 + 64, S - g - 2)
        caches = [dataclasses.replace(c, lengths=committed) for c in caches]
        dcache = dataclasses.replace(dcache, lengths=committed)
        return (caches, dcache, corr, h_corr), (accepted + 1).sum()

    t_tick = time_loop(f"eagle_tick_g{g}", eagle_tick)
    t_tree = time_loop(f"eagle_tree_tick_g{g}_j{J}", eagle_tree_tick)
    t_plain = time_loop("plain_step", plain_step)
    need = t_tick / t_plain
    breakeven = max(0.0, (need - 1.0) / g)
    print(json.dumps({
        "metric": "eagle_mechanics", "gamma": g, "batch": B,
        "draft_mode": draft_mode, "layers": cfg.num_hidden_layers,
        "t_tick_us": round(t_tick * 1e6, 1),
        "t_plain_us": round(t_plain * 1e6, 1),
        "tick_cost_in_plain_steps": round(need, 3),
        "breakeven_accept_frac": round(breakeven, 3),
        "speedup_at_full_accept": round((g + 1) / need, 3),
    }), flush=True)
    need_tree = t_tree / t_plain
    print(json.dumps({
        "metric": "eagle_tree_mechanics", "gamma": g, "branches": J,
        "batch": B, "draft_mode": draft_mode,
        "layers": cfg.num_hidden_layers,
        "t_tick_us": round(t_tree * 1e6, 1),
        "t_plain_us": round(t_plain * 1e6, 1),
        "tick_cost_in_plain_steps": round(need_tree, 3),
        "breakeven_accept_frac": round(
            max(0.0, (need_tree - 1.0) / g), 3),
        "speedup_at_full_accept": round((g + 1) / need_tree, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
