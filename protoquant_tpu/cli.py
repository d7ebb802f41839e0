"""CLI (SURVEY.md §5.6): thin argparse mapping onto the dataclass configs.

  python -m protoquant_tpu.cli convert  --weights w.npz --config cfg.json --out ckpt/
  python -m protoquant_tpu.cli generate --ckpt ckpt/ --prompt-tokens 1,2,3 --max-new 32
  python -m protoquant_tpu.cli serve    --ckpt ckpt/ --port 8199

Weight sources are local files only (no network in scope): .npz / .safetensors
with HF Llama names, converted via models.hf_import.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

import jax.numpy as jnp
import numpy as np


def _load_state_dict(path: str):
    if path.endswith(".npz"):
        return dict(np.load(path))
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    raise ValueError(f"unsupported weight file {path!r} (use .npz/.safetensors)")


def cmd_convert(args):
    from .models.hf_import import import_hf_llama
    from .nn import quantize_params
    from .utils.checkpoint import save_checkpoint
    from .utils.config import ModelConfig, QuantConfig, to_json

    with open(args.config) as f:
        cfg = ModelConfig(**json.load(f))
    qcfg = QuantConfig(
        mode=args.mode,
        int4_group=args.int4_group,
        int4_storage=args.int4_storage,
        fp8_group=args.fp8_group,
    )
    sd = _load_state_dict(args.weights)
    if any(k.startswith("gpt_neox.") for k in sd):
        from .models.hf_import import import_hf_gpt_neox

        params = import_hf_gpt_neox(sd, cfg)
    elif any(
        k.startswith("transformer.word_embeddings_layernorm.") for k in sd
    ):
        # BLOOM (must precede Falcon: both use transformer.word_embeddings;
        # the embedding layernorm is BLOOM-unique).
        from .models.hf_import import import_hf_bloom

        params = import_hf_bloom(sd, cfg)
    elif any(k.startswith("transformer.word_embeddings.") for k in sd):
        from .models.hf_import import import_hf_falcon

        params = import_hf_falcon(sd, cfg)
    elif any(k.startswith("transformer.wte.") for k in sd):
        from .models.hf_import import import_hf_gpt2

        params = import_hf_gpt2(sd, cfg)
    else:
        params = import_hf_llama(sd, cfg)
    if args.smooth_alpha is not None:
        # SmoothQuant calibration (nn/smooth.py): migrate activation
        # outliers into the weights before quantizing. Calibration tokens
        # come from --calib-tokens (comma-separated ids; reshaped [1, T]).
        import jax.numpy as jnp

        from .models import LlamaModel
        from .nn.smooth import smoothquant

        if not args.calib_tokens:
            raise SystemExit("--smooth-alpha requires --calib-tokens")
        toks = jnp.asarray(
            [[int(t) for t in args.calib_tokens.split(",")]], jnp.int32
        )
        fp_model = LlamaModel(cfg, mode="fp")
        params = smoothquant(fp_model, params, toks, alpha=args.smooth_alpha)
    if args.awq:
        # AWQ grid-searched migration (nn/awq.py) against the DEPLOYMENT
        # quantization scheme; composes after --smooth-alpha (the grid
        # runs on the smoothed params) and before --gptq (whose grams are
        # collected on the migrated params) — the measured best-int4
        # composition order (BASELINE.md ladder v2 decision 9a).
        import jax.numpy as jnp

        from .models import LlamaModel
        from .nn import awq_quantize

        if not args.calib_tokens:
            raise SystemExit("--awq requires --calib-tokens")
        toks = jnp.asarray(
            [[int(t) for t in args.calib_tokens.split(",")]], jnp.int32
        )
        fp_model = LlamaModel(cfg, mode="fp")
        params = awq_quantize(fp_model, params, toks, qcfg)
    if args.gptq:
        # GPTQ error-compensated rounding (nn/gptq.py); reuses the
        # --calib-tokens corpus (composes with --smooth-alpha: grams are
        # collected on the smoothed fp params).
        import jax.numpy as jnp

        from .models import LlamaModel
        from .nn import collect_grams, gptq_params

        if not args.calib_tokens:
            raise SystemExit("--gptq requires --calib-tokens")
        toks = jnp.asarray(
            [[int(t) for t in args.calib_tokens.split(",")]], jnp.int32
        )
        fp_model = LlamaModel(cfg, mode="fp")
        grams = collect_grams(fp_model, params, toks)
        qparams = gptq_params(params, grams, qcfg)
    elif args.mode == "static":
        # W8A8-static: calibrate per-tensor activation scales on the fp
        # model (composes with --smooth-alpha: calibration sees the
        # smoothed activations the serving graph will see).
        import jax.numpy as jnp

        from .models import LlamaModel
        from .nn import static_quantize

        if not args.calib_tokens:
            raise SystemExit("--mode static requires --calib-tokens")
        toks = jnp.asarray(
            [[int(t) for t in args.calib_tokens.split(",")]], jnp.int32
        )
        fp_model = LlamaModel(cfg, mode="fp")
        qparams = static_quantize(fp_model, params, toks, qcfg)
    else:
        qparams = quantize_params(params, qcfg)
    # Phi-3 ships natively fused qkv/gate_up projections; the restoring
    # model must be built with fused=True, so record it in the meta.
    layer0 = qparams.get("params", qparams).get("layers_0", {})
    fused = "qkv_proj" in layer0.get("self_attn", {})
    save_checkpoint(
        args.out,
        qparams,
        json.dumps(
            {"model": dataclasses.asdict(cfg), "quant": dataclasses.asdict(qcfg),
             "fused": fused}
        ),
    )
    print(f"wrote quantized checkpoint to {args.out}")


def _restore_model(ckpt: str):
    """Checkpoint dir -> (model, params): rebuild the LlamaModel with the
    SAME quant layout + fusedness the checkpoint was written with, restore
    the QTensor tree against a matching example."""
    import jax

    from .models import LlamaModel
    from .nn import quantize_params
    from .utils.checkpoint import load_config, restore_checkpoint
    from .utils.config import ModelConfig, QuantConfig

    meta = load_config(ckpt)
    cfg = ModelConfig(**meta["model"])
    qcfg = QuantConfig(**meta["quant"])
    fused = bool(meta.get("fused", False))
    # The model's int4 layout attributes must match the checkpoint's
    # QuantConfig, or flax rejects the restored payload shapes.
    model = LlamaModel(
        cfg, mode=qcfg.mode, fused=fused,
        int4_group=qcfg.int4_group, int4_storage=qcfg.int4_storage,
        fp8_group=qcfg.fp8_group,
    )
    fp_model = LlamaModel(cfg, mode="fp", fused=fused)
    example = quantize_params(
        fp_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32)),
        qcfg,
    )
    return model, restore_checkpoint(ckpt, example)


def cmd_medusa_train(args):
    """Self-distill drafting heads on the quantized checkpoint's own greedy
    streams (models/medusa.py): no labels, no extra data — the corpus is
    what the engine will actually decode."""
    import jax

    from .models import greedy_generate
    from .models.medusa import init_hydra, init_medusa, train_medusa_heads
    from .utils.checkpoint import save_checkpoint

    model, params = _restore_model(args.ckpt)
    init = init_hydra if args.style == "hydra" else init_medusa
    heads, hp = init(model, args.depth, jax.random.PRNGKey(args.seed))
    if args.corpus:
        corpus = jnp.asarray(np.load(args.corpus)["tokens"], jnp.int32)
    else:
        if not args.prompt_tokens:
            raise SystemExit("medusa-train needs --corpus or --prompt-tokens")
        prompts = jnp.asarray(
            [[int(t) for t in args.prompt_tokens.split(",")]], jnp.int32
        )
        out = greedy_generate(
            model, params, prompts, args.distill_len,
            prompts.shape[1] + args.distill_len + 8,
        )
        corpus = jnp.concatenate([prompts, jnp.asarray(out, jnp.int32)], 1)
    hp, losses = train_medusa_heads(
        model, params, heads, hp, [corpus] * args.steps, lr=args.lr
    )
    save_checkpoint(
        args.out, hp, json.dumps({"depth": args.depth, "style": args.style})
    )
    print(json.dumps({"loss_first": losses[0], "loss_last": losses[-1],
                      "out": args.out}))


def cmd_eagle_train(args):
    """Self-distill an EAGLE feature-space draft (models/eagle.py) on the
    checkpoint's own greedy streams: the frozen base provides hidden
    features; the one-layer draft learns the combined CE + feature-
    regression loss. The corpus should be base-generated text — acceptance
    measures draft/base agreement (tests/test_eagle.py)."""
    import jax

    from .models import greedy_generate
    from .models.eagle import init_eagle, train_eagle
    from .utils.checkpoint import save_checkpoint

    model, params = _restore_model(args.ckpt)
    draft, dp = init_eagle(
        model, jax.random.PRNGKey(args.seed), dtype=jnp.float32,
        base_params=params,
    )
    if args.corpus:
        corpus = jnp.asarray(np.load(args.corpus)["tokens"], jnp.int32)
    else:
        if not args.prompt_tokens:
            raise SystemExit("eagle-train needs --corpus or --prompt-tokens")
        prompts = jnp.asarray(
            [[int(t) for t in args.prompt_tokens.split(",")]], jnp.int32
        )
        out = greedy_generate(
            model, params, prompts, args.distill_len,
            prompts.shape[1] + args.distill_len + 8,
        )
        corpus = jnp.concatenate([prompts, jnp.asarray(out, jnp.int32)], 1)
    dp, losses = train_eagle(
        model, params, draft, dp, [corpus] * args.steps, lr=args.lr
    )
    save_checkpoint(args.out, dp, json.dumps({"kind": "eagle"}))
    print(json.dumps({"loss_first": losses[0], "loss_last": losses[-1],
                      "out": args.out}))


def _load_eagle(args, model):
    """--eagle checkpoint dir -> (EagleDraft, draft_params) or (None, None).
    Trained fp layout on disk; serving quantizes on load (--eagle-mode)."""
    if not getattr(args, "eagle", None):
        return None, None
    import jax

    from .models.eagle import init_eagle, quantize_eagle
    from .utils.checkpoint import restore_checkpoint

    draft, example = init_eagle(
        model, jax.random.PRNGKey(0), dtype=jnp.float32
    )
    dp = restore_checkpoint(args.eagle, example)
    mode = getattr(args, "eagle_mode", "dynamic")
    if mode != "fp":
        draft, dp = quantize_eagle(draft, dp, mode)
    return draft, dp


def _load_medusa(args, model):
    """--medusa checkpoint dir -> (heads_module, head_params) or (None, None).

    Heads checkpoints store the trained fp layout; serving quantizes them on
    load (--medusa-mode, default dynamic int8 — the head vocab projections
    are the dominant HBM read of a medusa tick, bench/medusa_bench.py)."""
    if not getattr(args, "medusa", None):
        return None, None
    import jax

    from .models.medusa import init_hydra, init_medusa, quantize_medusa
    from .utils.checkpoint import load_config, restore_checkpoint

    meta = load_config(args.medusa)
    depth = int(meta["depth"])
    init = init_hydra if meta.get("style") == "hydra" else init_medusa
    heads, example = init(model, depth, jax.random.PRNGKey(0))
    params = restore_checkpoint(args.medusa, example)
    mode = getattr(args, "medusa_mode", "dynamic")
    if mode != "fp":
        heads, params = quantize_medusa(heads, params, mode)
    return heads, params


def _load_tokenizer(args):
    if getattr(args, "tokenizer", None):
        from .tokenizer import Tokenizer

        return Tokenizer.from_file(args.tokenizer)
    return None


def _kv_dtype(args):
    bits = getattr(args, "kv_bits", None)
    if bits is None:
        return jnp.int8 if args.int8_kv else jnp.bfloat16
    # 6 = the K4V8 mixed tier (KIVI int4 keys + int8 values — the DOMINANT
    # 6-bit design, BASELINE.md ladder v2 decisions 2 and 8; the demoted
    # K8V4 layout stays reachable via kv_dtype="k8v4" in the Python API).
    return {4: jnp.int4, 6: "k4v8", 8: jnp.int8, 16: jnp.bfloat16}[bits]


def cmd_generate(args):
    tok = _load_tokenizer(args)
    if args.prompt is not None:
        if tok is None:
            raise SystemExit("--prompt needs --tokenizer (or use --prompt-tokens)")
        prompt = tok.encode(args.prompt)
    else:
        prompt = [int(t) for t in args.prompt_tokens.split(",")]
    eng = _load_engine(args, max_new_tokens=args.max_new)
    rid = eng.add_request(prompt, args.max_new)
    out = eng.run()[rid]
    rec = {"request": rid, "tokens": out, "metrics": eng.metrics()}
    if tok is not None:
        rec["text"] = tok.decode(out)
    print(json.dumps(rec))


def _load_engine(args, **ecfg_extra):
    """The ONE engine constructor behind both `generate` and `serve` —
    every engine kwarg (speculation wiring included) lives here exactly once."""
    from .engine import Engine, EngineConfig

    model, params = _restore_model(args.ckpt)
    ecfg = EngineConfig(
        max_batch_size=args.batch,
        max_seq_len=args.max_seq,
        temperature=args.temperature,
        top_k=args.top_k,
        top_p=args.top_p,
        min_p=args.min_p,
        repetition_penalty=args.repetition_penalty,
        **ecfg_extra,
    )
    heads, hparams = _load_medusa(args, model)
    eagle_draft, eagle_params = _load_eagle(args, model)
    draft_model = draft_params = None
    if getattr(args, "draft_ckpt", None):
        # Draft-model speculation: a second (smaller) quantized checkpoint
        # proposes; acceptance keeps the stream exact (greedy) /
        # distribution-exact (sampling).
        draft_model, draft_params = _restore_model(args.draft_ckpt)
    prompt_lookup = getattr(args, "prompt_lookup", 0)
    return Engine(
        model, params, ecfg, kv_dtype=_kv_dtype(args),
        medusa_heads=heads, medusa_params=hparams,
        eagle_draft=eagle_draft, eagle_params=eagle_params,
        draft_model=draft_model, draft_params=draft_params,
        prompt_lookup=prompt_lookup,
        gamma=(heads.depth if heads is not None
               else getattr(args, "gamma", 4)),
        adaptive_gamma=getattr(args, "adaptive_gamma", False),
        lookup_branches=(
            args.medusa_branches if heads is not None
            else getattr(args, "eagle_tree", 1)
            if eagle_draft is not None
            else getattr(args, "lookup_branches", 1)
        ),
    )


def cmd_serve(args):
    from .engine.server import EngineServer
    from .utils.logging import get_logger

    eng = _load_engine(args)
    srv = EngineServer(
        eng, host=args.host, port=args.port, tokenizer=_load_tokenizer(args),
        model_name=args.model_name,
    ).start()
    log = get_logger()
    log.info(f"serving on http://{args.host}:{srv.port} "
             "(POST /generate | OpenAI POST /v1/completions)")
    import time

    try:
        while True:
            time.sleep(10)
            log.info("metrics: %s", eng.metrics())
    except KeyboardInterrupt:
        srv.stop()


def main(argv=None):
    p = argparse.ArgumentParser("protoquant_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("convert", help="fp weights -> quantized checkpoint")
    c.add_argument("--weights", required=True)
    c.add_argument("--config", required=True, help="ModelConfig json")
    c.add_argument(
        "--mode",
        default="dynamic",
        choices=["dynamic", "static", "weight_only", "weight_only_int4",
                 "dynamic_int4", "weight_only_fp8"],
    )
    c.add_argument(
        "--int4-group", type=int, default=128,
        help="int4 scale-group size; the measured best-quality int4 recipe "
             "is --int4-group 64 --smooth-alpha 0.5 --awq --gptq "
             "(BASELINE.md ladder v2 decision 9a)",
    )
    c.add_argument(
        "--int4-storage", default="packed", choices=["packed", "native"],
        help="int4 payload layout: byte-packed (Pallas wo4 kernel) or native jnp.int4 (XLA s4)",
    )
    c.add_argument(
        "--fp8-group", type=int, default=0,
        help="fp8 scale granularity: 0 per-channel, g>0 per-(K-group, channel)",
    )
    c.add_argument("--out", required=True)
    c.add_argument(
        "--smooth-alpha", type=float, default=None,
        help="SmoothQuant migration strength (e.g. 0.5); off when omitted",
    )
    c.add_argument(
        "--calib-tokens", default=None,
        help="comma-separated calibration token ids (--smooth-alpha/--gptq)",
    )
    c.add_argument(
        "--awq", action="store_true",
        help="AWQ grid-searched scale migration against the deployment "
             "scheme (after --smooth-alpha, before --gptq)",
    )
    c.add_argument(
        "--gptq", action="store_true",
        help="GPTQ error-compensated rounding (needs --calib-tokens)",
    )
    c.set_defaults(fn=cmd_convert)

    g = sub.add_parser("generate", help="decode from a quantized checkpoint")
    g.add_argument("--ckpt", required=True)
    g.add_argument("--prompt-tokens", default=None, help="comma-separated ids")
    g.add_argument("--prompt", default=None, help="text prompt (needs --tokenizer)")
    g.add_argument("--tokenizer", default=None,
                   help="HF tokenizer.json path (text in/out)")
    g.add_argument("--max-new", type=int, default=32)
    g.add_argument("--max-seq", type=int, default=2048)
    g.add_argument("--batch", type=int, default=1)
    g.add_argument("--temperature", type=float, default=0.0)
    g.add_argument("--top-k", type=int, default=0)
    g.add_argument("--top-p", type=float, default=1.0)
    g.add_argument("--min-p", type=float, default=0.0)
    g.add_argument("--repetition-penalty", type=float, default=1.0)
    g.add_argument("--int8-kv", action="store_true", default=True)
    g.add_argument("--kv-bits", type=int, default=None, choices=[4, 6, 8, 16],
                   help="KV storage: 8 int8 (default), 6 K8V4 mixed "
                        "(int8 keys + int4 values), 4 packed int4 "
                        "(capacity tier), 16 bf16")
    g.add_argument("--medusa", default=None,
                   help="drafting-heads checkpoint dir (medusa-train output)")
    g.add_argument("--medusa-branches", type=int, default=4)
    g.add_argument("--draft-ckpt", default=None,
                    help="smaller quantized checkpoint for draft-model "
                         "speculation (exact/distribution-exact acceptance)")
    g.add_argument("--prompt-lookup", type=int, default=0,
                    help="n-gram length for draft-free speculation (0=off)")
    g.add_argument("--lookup-branches", type=int, default=1,
                    help=">1 = tree speculation over n-gram candidates")
    g.add_argument("--gamma", type=int, default=4,
                    help="speculation lookahead per tick")
    g.add_argument("--adaptive-gamma", action="store_true",
                    help="adapt lookahead from measured acceptance")
    g.add_argument("--medusa-mode", default="dynamic",
                   choices=["fp", "dynamic", "weight_only"],
                   help="drafting-head serving quantization")
    g.add_argument("--eagle", default=None,
                   help="EAGLE draft checkpoint dir (eagle-train output)")
    g.add_argument("--eagle-mode", default="dynamic",
                   choices=["fp", "dynamic", "weight_only"],
                   help="EAGLE draft serving quantization")
    g.add_argument("--eagle-tree", type=int, default=1,
                   help=">1 = EAGLE-2-style tree speculation: the draft's "
                        "top-J step-1 candidates each continue to depth "
                        "gamma and score in one tree forward")
    g.set_defaults(fn=cmd_generate)

    et = sub.add_parser(
        "eagle-train",
        help="self-distill an EAGLE feature-space draft for speculation",
    )
    et.add_argument("--ckpt", required=True)
    et.add_argument("--out", required=True, help="draft checkpoint dir")
    et.add_argument("--steps", type=int, default=200)
    et.add_argument("--lr", type=float, default=1e-3)
    et.add_argument("--seed", type=int, default=0)
    et.add_argument("--corpus", default=None,
                    help=".npz with a [N, T] int32 'tokens' array")
    et.add_argument("--prompt-tokens", default=None,
                    help="comma-separated seed ids for self-distillation")
    et.add_argument("--distill-len", type=int, default=128,
                    help="greedy continuation length per self-distill prompt")
    et.set_defaults(fn=cmd_eagle_train)

    mt = sub.add_parser(
        "medusa-train",
        help="self-distill drafting heads for tree speculation",
    )
    mt.add_argument("--ckpt", required=True)
    mt.add_argument("--out", required=True, help="heads checkpoint dir")
    mt.add_argument("--depth", type=int, default=3)
    mt.add_argument("--style", default="medusa", choices=["medusa", "hydra"],
                    help="medusa: independent per-depth heads; hydra: "
                         "sequential heads conditioning on proposed tokens")
    mt.add_argument("--steps", type=int, default=200)
    mt.add_argument("--lr", type=float, default=1e-3)
    mt.add_argument("--seed", type=int, default=0)
    mt.add_argument("--corpus", default=None,
                    help=".npz with a [N, T] int32 'tokens' array")
    mt.add_argument("--prompt-tokens", default=None,
                    help="comma-separated seed ids for self-distillation")
    mt.add_argument("--distill-len", type=int, default=128,
                    help="greedy continuation length per self-distill prompt")
    mt.set_defaults(fn=cmd_medusa_train)

    sv = sub.add_parser("serve", help="HTTP serving frontend")
    sv.add_argument("--ckpt", required=True)
    sv.add_argument("--tokenizer", default=None,
                    help='HF tokenizer.json: accepts {"prompt": text} + returns "text"')
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--model-name", default="protoquant-tpu",
                    help="model id echoed on the OpenAI surface "
                         "(/v1/models, completions responses)")
    sv.add_argument("--port", type=int, default=8199)
    sv.add_argument("--batch", type=int, default=8)
    sv.add_argument("--max-seq", type=int, default=2048)
    sv.add_argument("--temperature", type=float, default=0.0)
    sv.add_argument("--top-k", type=int, default=0)
    sv.add_argument("--top-p", type=float, default=1.0)
    sv.add_argument("--min-p", type=float, default=0.0)
    sv.add_argument("--repetition-penalty", type=float, default=1.0)
    sv.add_argument("--int8-kv", action="store_true", default=True)
    sv.add_argument("--kv-bits", type=int, default=None, choices=[4, 6, 8, 16],
                    help="KV storage: 8 int8 (default), 6 K8V4 mixed, "
                         "4 packed int4, 16 bf16")
    sv.add_argument("--medusa", default=None,
                    help="drafting-heads checkpoint dir (medusa-train output)")
    sv.add_argument("--medusa-branches", type=int, default=4)
    sv.add_argument("--draft-ckpt", default=None,
                    help="smaller quantized checkpoint for draft-model "
                         "speculation (exact/distribution-exact acceptance)")
    sv.add_argument("--prompt-lookup", type=int, default=0,
                    help="n-gram length for draft-free speculation (0=off)")
    sv.add_argument("--lookup-branches", type=int, default=1,
                    help=">1 = tree speculation over n-gram candidates")
    sv.add_argument("--gamma", type=int, default=4,
                    help="speculation lookahead per tick")
    sv.add_argument("--adaptive-gamma", action="store_true",
                    help="adapt lookahead from measured acceptance")
    sv.add_argument("--medusa-mode", default="dynamic",
                    choices=["fp", "dynamic", "weight_only"],
                    help="drafting-head serving quantization")
    sv.add_argument("--eagle", default=None,
                    help="EAGLE draft checkpoint dir (eagle-train output)")
    sv.add_argument("--eagle-mode", default="dynamic",
                    choices=["fp", "dynamic", "weight_only"],
                    help="EAGLE draft serving quantization")
    sv.add_argument("--eagle-tree", type=int, default=1,
                    help=">1 = EAGLE-2-style tree speculation (top-J "
                         "step-1 candidates, one tree forward)")
    sv.set_defaults(fn=cmd_serve)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
