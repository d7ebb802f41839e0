"""Quantization-quality ladder: every weight mode on the SAME shaped model.

Extends bench/acceptance.py's config-3 evidence into a mode-by-mode table:
int8 dynamic (+/- SmoothQuant), int8 weight-only, fp8 weight-only, int4
weight-only — all against the same fp32 weights, with the shaped lm_head
(peaked logits; greedy agreement measures real decisions, not tie-breaks)
and injected activation outliers (a few boosted norm channels — the regime
trained LLMs live in and the one SmoothQuant exists for).

Ladder v2 (round 4, VERDICT r3 item 3): the v1 defaults (4L-d512) were
chaos-dominated — every 4-bit row saturated at ~0 greedy match and 80-97%
ppl delta, so 4-bit decisions were unmeasurable. v2 defaults to a deeper
proxy (12L, d=1024, 16q/8kv GQA) with MULTIPLE prompts and longer
generations, and adds a prefix-match metric (fraction decoded before first
divergence — positional match over-penalizes a single early flip). The v1
table is kept in BASELINE.md for contrast.

Usage: python bench/quality_ladder.py [--cpu] [--layers 12] [--hidden 1024]
Prints one JSON object per mode plus a summary table.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--hidden", type=int, default=1024)
    ap.add_argument("--vocab", type=int, default=2048)
    ap.add_argument("--new-tokens", type=int, default=160)  # > 2 KIVI
    # chunks (128 tokens) so the int4-KV rows actually READ packed nibbles
    # (shorter runs live entirely in the int8 tail and measure nothing)
    ap.add_argument("--prompts", type=int, default=4)
    ap.add_argument("--outlier-boost", type=float, default=30.0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--only", default=None,
                    help="substring filter: run only matching rows")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from protoquant_tpu.models import LlamaModel, greedy_generate, perplexity
    from protoquant_tpu.nn import quantize_params, smoothquant
    from protoquant_tpu.utils.config import ModelConfig, QuantConfig

    rng = np.random.default_rng(0)
    cfg = ModelConfig(
        vocab_size=args.vocab,
        hidden_size=args.hidden,
        intermediate_size=args.hidden * 2,
        num_hidden_layers=args.layers,
        num_attention_heads=max(1, args.hidden // 64),
        num_key_value_heads=max(1, args.hidden // 128),
        max_position_embeddings=256,
    )
    fp_model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = fp_model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))
    params = jax.tree_util.tree_map(lambda a: a, params)

    # Shaped lm_head (see bench/acceptance.py config 3 for the derivation).
    V, _ = cfg.vocab_size, cfg.hidden_size
    perm = rng.permutation(V)
    emb = np.asarray(params["params"]["embed_tokens"]["embedding"], np.float32)
    params["params"]["lm_head"]["kernel"] = jnp.asarray(4.0 * emb[np.argsort(perm)].T)

    # Depth-stable residual stack (ladder v2): random inits compound over
    # 12 layers — GPT-2-style 1/sqrt(2L) scaling on the residual OUTPUT
    # projections keeps hidden magnitudes bounded, so the bf16 reference is
    # non-chaotic and quantization error is resolvable instead of
    # saturating every metric (the v1 failure mode, just deeper).
    resid_scale = 1.0 / np.sqrt(2.0 * args.layers)
    # Activation outliers, FUNCTION-PRESERVING (inverse SmoothQuant): boost
    # a few norm-gain channels by `outlier_boost` and divide the consuming
    # projections' matching input rows by the same factor. The bf16 model
    # computes exactly what the unboosted model would — but the activation
    # tensors on the wire carry genuine x30 outlier channels, which is the
    # regime trained LLMs live in and the one per-token activation
    # quantization (and SmoothQuant) must survive.
    n_out = max(4, args.hidden // 64)
    for lname, layer in params["params"].items():
        if not lname.startswith("layers_"):
            continue
        for norm, consumers in (
            ("input_layernorm",
             [layer["self_attn"][k] for k in ("q_proj", "k_proj", "v_proj")]),
            ("post_attention_layernorm",
             [layer["mlp"][k] for k in ("gate_proj", "up_proj")]),
        ):
            w = layer[norm]["weight"]
            layer[norm]["weight"] = w.at[:n_out].mul(args.outlier_boost)
            for proj in consumers:
                k = proj["kernel"]  # [in, out]
                proj["kernel"] = k.at[:n_out, :].mul(1.0 / args.outlier_boost)
        for proj in (layer["self_attn"]["o_proj"], layer["mlp"]["down_proj"]):
            proj["kernel"] = proj["kernel"] * resid_scale

    prompt = jnp.asarray(rng.integers(0, V, (args.prompts, 16)), jnp.int32)
    g_fp = np.asarray(
        greedy_generate(fp_model, params, prompt, args.new_tokens, 256,
                        kv_dtype=jnp.float32)
    )
    eval_toks = jnp.concatenate([prompt, jnp.asarray(g_fp, jnp.int32)], axis=1)
    logits_fp = np.asarray(fp_model.apply(params, eval_toks))
    ppl_fp = perplexity(fp_model, params, eval_toks)

    calib = jnp.asarray(rng.integers(0, V, (2, 64)), jnp.int32)
    smoothed = smoothquant(fp_model, params, calib, alpha=0.5)
    # GPTQ needs a well-conditioned Gram for the widest linear (K = 2*hidden
    # at down_proj): >= 2x that many calibration tokens (see nn/gptq.py).
    from protoquant_tpu.nn import collect_grams, gptq_params

    gptq_calib = jnp.asarray(
        rng.integers(0, V, (max(4, 6 * args.hidden // 128), 128)), jnp.int32
    )
    _grams_cache = {}

    def get_grams():  # lazy: only selected gptq rows pay for the Gram pass
        if "g" not in _grams_cache:
            _grams_cache["g"] = collect_grams(fp_model, params, gptq_calib)
        return _grams_cache["g"]

    rows = []

    # --only accepts comma-separated substrings (any match selects a row),
    # so a partial re-run after an interrupted sweep can name exactly the
    # missing rows.
    only_terms = [t for t in (args.only or "").split(",") if t]

    def _sel(label):
        return not only_terms or any(t in label for t in only_terms)

    def run(label, mode, src_params, kv_dtype=jnp.float32, qcfg=None,
            gptq=False, use_grams=None, params_override=None):
        if not _sel(label):
            return
        qcfg_eff = qcfg or QuantConfig(mode=mode)
        if params_override is not None:
            qp = params_override
        elif gptq:
            qp = gptq_params(
                src_params,
                use_grams if use_grams is not None else get_grams(),
                qcfg_eff,
            )
        else:
            qp = quantize_params(src_params, qcfg_eff)
        qm = LlamaModel(cfg, mode=mode, int4_group=qcfg_eff.int4_group,
                        fp8_group=qcfg_eff.fp8_group, dtype=jnp.float32)
        lq = np.asarray(qm.apply(qp, eval_toks))
        cos = float(
            np.sum(logits_fp * lq)
            / (np.linalg.norm(logits_fp) * np.linalg.norm(lq) + 1e-12)
        )
        top1 = float(np.mean(np.argmax(logits_fp, -1) == np.argmax(lq, -1)))
        g_q = np.asarray(
            greedy_generate(qm, qp, prompt, args.new_tokens, 256, kv_dtype=kv_dtype)
        )
        gm = float(np.mean(g_fp == g_q))
        # Prefix match: fraction decoded before the first divergence, per
        # prompt — positional match over-penalizes one early flip.
        div = (g_fp != g_q)
        first = np.where(
            div.any(axis=1), div.argmax(axis=1), g_fp.shape[1]
        )
        prefix = float(np.mean(first / g_fp.shape[1]))
        ppl_q = perplexity(qm, qp, eval_toks)
        row = {
            "mode": label,
            "logit_cosine": round(cos, 6),
            "top1_agreement": round(top1, 4),
            "greedy_match": round(gm, 4),
            "prefix_match": round(prefix, 4),
            # Median tokens decoded before the first divergence (VERDICT
            # r4 weak-7): unlike the rollout-length-bound greedy/prefix
            # fractions, this absolute position stays comparable across
            # rows even where the 160-token tail is chaos-dominated.
            "div_pos_median": float(np.median(first)),
            "ppl_rel_delta": round(abs(float(ppl_q - ppl_fp)) / float(ppl_fp), 5),
        }
        rows.append(row)
        print(json.dumps(row))

    from protoquant_tpu.nn import awq_quantize

    # Lazy AWQ calibrations: the grid searches are the sweep's most
    # expensive host-side passes — only selected rows pay for them.
    awq_int8 = (
        awq_quantize(fp_model, params, calib, QuantConfig(mode="dynamic"))
        if _sel("int8_dynamic+awq") else None
    )
    need_awq4 = any(_sel(l) for l in (
        "int4_weight_only_g128+awq", "int4_weight_only_g128+awq+gptq",
        "int4_weight_only_g128+awq+amax",
    ))
    awq_int4 = (
        awq_quantize(
            fp_model, params, calib,
            QuantConfig(mode="weight_only_int4", int4_group=128),
        ) if need_awq4 else None
    )

    # KV-cache rows on UNQUANTIZED weights: the logit/ppl metrics run
    # cache-free (teacher-forced) so they pin at the fp reference; the
    # greedy/prefix-match columns isolate the CACHE path alone — the
    # cleanest readout for int8/int4/mixed KV quality.
    def run_kv(label, kv_dtype):
        if not _sel(label):
            return
        g_q = np.asarray(
            greedy_generate(fp_model, params, prompt, args.new_tokens, 256,
                            kv_dtype=kv_dtype)
        )
        gm = float(np.mean(g_fp == g_q))
        div = (g_fp != g_q)
        first = np.where(
            div.any(axis=1), div.argmax(axis=1), g_fp.shape[1]
        )
        prefix = float(np.mean(first / g_fp.shape[1]))
        row = {"mode": label, "greedy_match": round(gm, 4),
               "prefix_match": round(prefix, 4),
               "div_pos_median": float(np.median(first))}
        rows.append(row)
        print(json.dumps(row))

    run_kv("fp+int8kv", jnp.int8)
    run_kv("fp+int4kv", jnp.int4)
    run_kv("fp+k8v4kv", "k8v4")
    run_kv("fp+k4v8kv", "k4v8")  # round 5: the dominant 6-bit mixed tier

    run("int8_dynamic", "dynamic", params)
    run("int8_dynamic+smooth", "dynamic", smoothed)
    # W8A8-STATIC (round 4, nn/static.py): calibrated per-tensor activation
    # scales — the delta vs the matching dynamic row is the static-clip /
    # per-token-resolution cost; SmoothQuant is its natural partner (the
    # outlier channels set the per-tensor amax).
    from protoquant_tpu.nn import static_quantize

    if _sel("int8_static"):
        run("int8_static", "static", params,
            params_override=static_quantize(fp_model, params, calib))
        run("int8_static+smooth", "static", smoothed,
            params_override=static_quantize(fp_model, smoothed, calib))
    run("int8_dynamic+awq", "dynamic", awq_int8)
    run("int8_dynamic+smooth+int8kv", "dynamic", smoothed, kv_dtype=jnp.int8)
    run("int8_dynamic+smooth+int4kv", "dynamic", smoothed, kv_dtype=jnp.int4)
    run("int8_dynamic+smooth+k8v4kv", "dynamic", smoothed, kv_dtype="k8v4")
    run("int8_dynamic+smooth+k4v8kv", "dynamic", smoothed, kv_dtype="k4v8")
    run("int8_weight_only", "weight_only", params)
    run("int8_weight_only+gptq", "weight_only", params, gptq=True)
    run("fp8_weight_only", "weight_only_fp8", params,
        qcfg=QuantConfig(mode="weight_only_fp8"))
    run("fp8_weight_only_g64", "weight_only_fp8", params,
        qcfg=QuantConfig(mode="weight_only_fp8", fp8_group=64))
    run("int4_weight_only_g128", "weight_only_int4", params,
        qcfg=QuantConfig(mode="weight_only_int4", int4_group=128))
    # W4A8: same int4 weights + dynamic int8 activations (the int8-MXU
    # prefill formulation, ops/w4a8_matmul.py) — the delta vs the
    # weight-only row above isolates the activation-quantization cost.
    run("int4_w4a8_g128", "dynamic_int4", params,
        qcfg=QuantConfig(mode="dynamic_int4", int4_group=128))
    # W4A8's quality cost is the ACTIVATION quantization in the outlier
    # regime — SmoothQuant is its natural partner.
    run("int4_w4a8_g128+smooth", "dynamic_int4", smoothed,
        qcfg=QuantConfig(mode="dynamic_int4", int4_group=128))
    # Two-level formulation (one big-K dot; in-kernel nibble requant):
    # the delta vs the row above is the requant's model-level cost.
    import protoquant_tpu.ops as _ops

    _ops.W4A8_FORMULATION = "two_level"
    run("int4_w4a8_g128+smooth+2l", "dynamic_int4", smoothed,
        qcfg=QuantConfig(mode="dynamic_int4", int4_group=128))
    _ops.W4A8_FORMULATION = "group"
    run("int4_weight_only_g128+gptq", "weight_only_int4", params,
        qcfg=QuantConfig(mode="weight_only_int4", int4_group=128), gptq=True)
    run("int4_weight_only_g128+awq", "weight_only_int4", awq_int4,
        qcfg=QuantConfig(mode="weight_only_int4", int4_group=128))
    # AWQ x GPTQ composition: grid-searched migration first, then error-
    # compensated rounding ON THE SCALED weights (grams re-collected on the
    # scaled params — the Gram must describe the activations GPTQ will see).
    if _sel("int4_weight_only_g128+awq+gptq"):
        grams_awq = collect_grams(fp_model, awq_int4, gptq_calib)
        run("int4_weight_only_g128+awq+gptq", "weight_only_int4", awq_int4,
            qcfg=QuantConfig(mode="weight_only_int4", int4_group=128),
            gptq=True, use_grams=grams_awq)

    # -- round-5 int4 recipe push (VERDICT r4 item 5) ------------------------
    want = _sel

    # Group-size sweep below g=128: finer scales cost more scale bytes but
    # each group's amax covers fewer weights (AWQ re-calibrated per group
    # size — its grid search must see the scheme it protects against).
    for gsz in (64, 32):
        label = f"int4_weight_only_g{gsz}+awq"
        if want(label):
            awq_g = awq_quantize(
                fp_model, params, calib,
                QuantConfig(mode="weight_only_int4", int4_group=gsz),
            )
            run(label, "weight_only_int4", awq_g,
                qcfg=QuantConfig(mode="weight_only_int4", int4_group=gsz))
    # Clip ablation: the default per-group mse clip-search vs plain amax
    # (never clips) under the best migration (AWQ).
    if want("int4_weight_only_g128+awq+amax"):
        run("int4_weight_only_g128+awq+amax", "weight_only_int4", awq_int4,
            qcfg=QuantConfig(mode="weight_only_int4", int4_group=128,
                             int4_clip="amax"))
    # The THREE-WAY composition: SmoothQuant flattens activation outliers,
    # AWQ migrates weight salience on the smoothed model, GPTQ
    # error-compensates rounding on the scaled weights (grams re-collected
    # on the composed params — the Gram must describe the activations GPTQ
    # will see).
    if want("int4_weight_only_g128+smooth+awq+gptq"):
        awq_sm = awq_quantize(
            fp_model, smoothed, calib,
            QuantConfig(mode="weight_only_int4", int4_group=128),
        )
        run("int4_weight_only_g128+smooth+awq", "weight_only_int4", awq_sm,
            qcfg=QuantConfig(mode="weight_only_int4", int4_group=128))
        grams_sm_awq = collect_grams(fp_model, awq_sm, gptq_calib)
        run("int4_weight_only_g128+smooth+awq+gptq", "weight_only_int4",
            awq_sm,
            qcfg=QuantConfig(mode="weight_only_int4", int4_group=128),
            gptq=True, use_grams=grams_sm_awq)
    # Best group size x the three-way (only meaningful if g<128 helps).
    if want("int4_weight_only_g64+smooth+awq+gptq"):
        awq_sm64 = awq_quantize(
            fp_model, smoothed, calib,
            QuantConfig(mode="weight_only_int4", int4_group=64),
        )
        grams_sm64 = collect_grams(fp_model, awq_sm64, gptq_calib)
        run("int4_weight_only_g64+smooth+awq+gptq", "weight_only_int4",
            awq_sm64,
            qcfg=QuantConfig(mode="weight_only_int4", int4_group=64),
            gptq=True, use_grams=grams_sm64)

    # ---- MoE rows (VERDICT r3 item 7): stacked experts by mode ----------
    # A compact Mixtral-style proxy with its own fp reference: the delta
    # between rows isolates EXPERT weight quantization (router stays fp by
    # structural skip; attention quantizes with the mode as usual).
    moe_cfg = ModelConfig(
        vocab_size=args.vocab,
        hidden_size=args.hidden // 2,
        intermediate_size=args.hidden,
        num_hidden_layers=max(2, args.layers // 3),
        num_attention_heads=max(1, args.hidden // 128),
        num_key_value_heads=max(1, args.hidden // 256),
        max_position_embeddings=256,
        num_local_experts=4,
        num_experts_per_tok=2,
        expert_capacity_factor=4.0,
    )
    moe_fp = LlamaModel(moe_cfg, mode="fp", dtype=jnp.float32)
    moe_params = moe_fp.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 8), jnp.int32)
    )
    moe_params = jax.tree_util.tree_map(lambda a: a, moe_params)
    emb2 = np.asarray(
        moe_params["params"]["embed_tokens"]["embedding"], np.float32
    )
    moe_params["params"]["lm_head"]["kernel"] = jnp.asarray(
        4.0 * emb2[np.argsort(rng.permutation(V))].T
    )
    moe_prompt = jnp.asarray(rng.integers(0, V, (args.prompts, 16)), jnp.int32)
    g_moe = np.asarray(greedy_generate(
        moe_fp, moe_params, moe_prompt, args.new_tokens, 256,
        kv_dtype=jnp.float32,
    ))
    moe_toks = jnp.concatenate([moe_prompt, jnp.asarray(g_moe)], axis=1)
    ppl_moe = perplexity(moe_fp, moe_params, moe_toks)
    for label, mode, grp in (
        ("moe_int8_dynamic", "dynamic", 128),
        ("moe_int8_weight_only", "weight_only", 128),
        ("moe_int4_weight_only_g128", "weight_only_int4", 128),
    ):
        if not _sel(label):
            continue
        qp = quantize_params(
            moe_params, QuantConfig(mode=mode, int4_group=grp)
        )
        qm = LlamaModel(moe_cfg, mode=mode, int4_group=grp,
                        dtype=jnp.float32)
        g_q = np.asarray(greedy_generate(
            qm, qp, moe_prompt, args.new_tokens, 256,
            kv_dtype=jnp.float32,
        ))
        div = g_moe != g_q
        first = np.where(div.any(1), div.argmax(1), g_moe.shape[1])
        ppl_q = perplexity(qm, qp, moe_toks)
        row = {
            "mode": label,
            "greedy_match": round(float(np.mean(g_moe == g_q)), 4),
            "prefix_match": round(float(np.mean(first / g_moe.shape[1])), 4),
            "ppl_rel_delta": round(
                abs(float(ppl_q - ppl_moe)) / float(ppl_moe), 5
            ),
        }
        rows.append(row)
        print(json.dumps(row))

    print(json.dumps({
        "scale": f"{args.layers}L-d{args.hidden} shaped logits, "
                 f"{n_out} outlier channels x{args.outlier_boost}",
        "ppl_fp": round(float(ppl_fp), 3),
        "ladder": rows,
    }))


if __name__ == "__main__":
    main()
