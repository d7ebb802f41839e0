"""CLI end-to-end: convert (local HF weights -> quantized ckpt) -> generate."""

import json

import numpy as np
import pytest

from protoquant_tpu.cli import main


@pytest.fixture(scope="module")
def weights_and_config(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(0)
    D, I, V, L = 64, 128, 64, 2
    kvh, H = 2, 4
    kv = kvh * (D // H)
    sd = {
        "model.embed_tokens.weight": rng.standard_normal((V, D)).astype(np.float32),
        "model.norm.weight": np.ones(D, np.float32),
        "lm_head.weight": rng.standard_normal((V, D)).astype(np.float32),
    }
    for i in range(L):
        p = f"model.layers.{i}"
        sd[f"{p}.input_layernorm.weight"] = np.ones(D, np.float32)
        sd[f"{p}.post_attention_layernorm.weight"] = np.ones(D, np.float32)
        sd[f"{p}.self_attn.q_proj.weight"] = 0.05 * rng.standard_normal((D, D)).astype(np.float32)
        sd[f"{p}.self_attn.k_proj.weight"] = 0.05 * rng.standard_normal((kv, D)).astype(np.float32)
        sd[f"{p}.self_attn.v_proj.weight"] = 0.05 * rng.standard_normal((kv, D)).astype(np.float32)
        sd[f"{p}.self_attn.o_proj.weight"] = 0.05 * rng.standard_normal((D, D)).astype(np.float32)
        sd[f"{p}.mlp.gate_proj.weight"] = 0.05 * rng.standard_normal((I, D)).astype(np.float32)
        sd[f"{p}.mlp.up_proj.weight"] = 0.05 * rng.standard_normal((I, D)).astype(np.float32)
        sd[f"{p}.mlp.down_proj.weight"] = 0.05 * rng.standard_normal((D, I)).astype(np.float32)
    wpath = tmp / "weights.npz"
    np.savez(wpath, **sd)
    cpath = tmp / "config.json"
    cpath.write_text(
        json.dumps(
            {
                "vocab_size": V, "hidden_size": D, "intermediate_size": I,
                "num_hidden_layers": L, "num_attention_heads": H,
                "num_key_value_heads": kvh, "max_position_embeddings": 128,
            }
        )
    )
    return tmp, str(wpath), str(cpath)


def test_cli_convert_then_generate(weights_and_config, capsys):
    tmp, wpath, cpath = weights_and_config
    out = str(tmp / "ckpt")
    main(["convert", "--weights", wpath, "--config", cpath, "--mode", "dynamic",
          "--out", out])
    capsys.readouterr()

    main(["generate", "--ckpt", out, "--prompt-tokens", "5,9,2,7",
          "--max-new", "8", "--max-seq", "64"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(rec["tokens"]) == 8
    assert all(0 <= t < 64 for t in rec["tokens"])
    assert rec["metrics"]["prefills"] == 1


def test_cli_bad_weights_extension(weights_and_config):
    tmp, wpath, cpath = weights_and_config
    with pytest.raises(ValueError, match="unsupported weight file"):
        main(["convert", "--weights", "w.pt", "--config", cpath, "--out", str(tmp / "x")])


@pytest.mark.slow
def test_cli_int4_native_convert_then_generate(weights_and_config, capsys):
    """Checkpoints record their int4 layout (group + storage); restore builds
    the model with the SAME layout — the regression here was a packed-layout
    model rejecting native-s4 payload shapes."""
    tmp, wpath, cpath = weights_and_config
    out = str(tmp / "ckpt_int4_native")
    main(["convert", "--weights", wpath, "--config", cpath,
          "--mode", "weight_only_int4", "--int4-group", "32",
          "--int4-storage", "native", "--out", out])
    capsys.readouterr()

    main(["generate", "--ckpt", out, "--prompt-tokens", "5,9,2,7",
          "--max-new", "6", "--max-seq", "64"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(rec["tokens"]) == 6
    assert all(0 <= t < 64 for t in rec["tokens"])


@pytest.mark.slow
def test_cli_longrope_fused_convert_then_generate(tmp_path, capsys):
    """Phi-3-shaped round trip: longrope tuple fields survive the JSON
    config (regression: frozen dataclasses holding lists were unhashable and
    crashed the engine jit on every converted checkpoint), and natively
    fused qkv/gate_up weights restore into a fused=True model."""
    rng = np.random.default_rng(1)
    D, I, V, L, H = 64, 128, 64, 2, 4
    Dh = D // H
    sd = {
        "model.embed_tokens.weight": rng.standard_normal((V, D)).astype(np.float32),
        "model.norm.weight": np.ones(D, np.float32),
        "lm_head.weight": rng.standard_normal((V, D)).astype(np.float32),
    }
    for i in range(L):
        p = f"model.layers.{i}"
        sd[f"{p}.input_layernorm.weight"] = np.ones(D, np.float32)
        sd[f"{p}.post_attention_layernorm.weight"] = np.ones(D, np.float32)
        sd[f"{p}.self_attn.qkv_proj.weight"] = 0.05 * rng.standard_normal(
            (3 * H * Dh, D)).astype(np.float32)
        sd[f"{p}.self_attn.o_proj.weight"] = 0.05 * rng.standard_normal(
            (D, D)).astype(np.float32)
        sd[f"{p}.mlp.gate_up_proj.weight"] = 0.05 * rng.standard_normal(
            (2 * I, D)).astype(np.float32)
        sd[f"{p}.mlp.down_proj.weight"] = 0.05 * rng.standard_normal(
            (D, I)).astype(np.float32)
    wpath = tmp_path / "weights.npz"
    np.savez(wpath, **sd)
    cpath = tmp_path / "config.json"
    cpath.write_text(json.dumps({
        "vocab_size": V, "hidden_size": D, "intermediate_size": I,
        "num_hidden_layers": L, "num_attention_heads": H,
        "num_key_value_heads": H, "max_position_embeddings": 128,
        "sliding_window": 5, "partial_rotary_factor": 0.5,
        "rope_scaling_type": "longrope",
        "rope_scaling_original_max_position_embeddings": 16,
        "rope_scaling_short_factor": [1.0, 1.1, 1.3, 1.6],
        "rope_scaling_long_factor": [2.0, 2.5, 3.0, 4.0],
    }))
    out = str(tmp_path / "ckpt")
    main(["convert", "--weights", str(wpath), "--config", str(cpath),
          "--mode", "dynamic", "--out", out])
    capsys.readouterr()

    main(["generate", "--ckpt", out, "--prompt-tokens", "5,9,2,7",
          "--max-new", "8", "--max-seq", "64"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(rec["tokens"]) == 8
    assert all(0 <= t < V for t in rec["tokens"])


@pytest.mark.slow
def test_cli_medusa_train_then_generate(weights_and_config, capsys):
    """medusa-train self-distills heads from the checkpoint, and
    generate --medusa serves through the trained-tree tick producing the
    exact greedy stream (plain generate on the same checkpoint)."""
    tmp, wpath, cpath = weights_and_config
    ckpt = str(tmp / "ckpt_medusa_base")
    main(["convert", "--weights", wpath, "--config", cpath, "--mode",
          "dynamic", "--out", ckpt])
    capsys.readouterr()

    main(["generate", "--ckpt", ckpt, "--prompt-tokens", "5,9,2,7",
          "--max-new", "12", "--max-seq", "64"])
    plain = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    heads = str(tmp / "heads")
    main(["medusa-train", "--ckpt", ckpt, "--out", heads, "--depth", "2",
          "--steps", "25", "--lr", "3e-3", "--prompt-tokens", "5,9,2,7",
          "--distill-len", "48"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["loss_last"] < rec["loss_first"]

    main(["generate", "--ckpt", ckpt, "--prompt-tokens", "5,9,2,7",
          "--max-new", "12", "--max-seq", "64", "--medusa", heads,
          "--medusa-branches", "3"])
    spec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert spec["tokens"] == plain["tokens"], (spec["tokens"], plain["tokens"])
    assert spec["metrics"]["spec_acceptance_rate"] >= 0.0


@pytest.mark.slow
def test_cli_static_convert_then_generate(weights_and_config, capsys):
    """convert --mode static calibrates per-tensor activation scales on
    --calib-tokens and the restored engine decodes (W8A8-static,
    nn/static.py)."""
    tmp, wpath, cpath = weights_and_config
    out = str(tmp / "ckpt_static")
    main(["convert", "--weights", wpath, "--config", cpath,
          "--mode", "static", "--calib-tokens", "5,9,2,7,1,3,8,8",
          "--out", out])
    capsys.readouterr()
    main(["generate", "--ckpt", out, "--prompt-tokens", "5,9,2,7",
          "--max-new", "8", "--max-seq", "64"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(rec["tokens"]) == 8
    assert all(0 <= t < 64 for t in rec["tokens"])


@pytest.mark.slow
def test_cli_eagle_train_then_generate(weights_and_config, capsys):
    """eagle-train self-distills the feature draft from the checkpoint's
    own greedy stream, and generate --eagle serves through the EAGLE tick
    producing the exact greedy stream."""
    tmp, wpath, cpath = weights_and_config
    ckpt = str(tmp / "ckpt_eagle_base")
    main(["convert", "--weights", wpath, "--config", cpath, "--mode",
          "dynamic", "--out", ckpt])
    capsys.readouterr()

    main(["generate", "--ckpt", ckpt, "--prompt-tokens", "5,9,2,7",
          "--max-new", "12", "--max-seq", "64"])
    plain = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    draft = str(tmp / "eagle_draft")
    main(["eagle-train", "--ckpt", ckpt, "--out", draft,
          "--steps", "25", "--lr", "3e-3", "--prompt-tokens", "5,9,2,7",
          "--distill-len", "40"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["loss_last"] < rec["loss_first"]

    main(["generate", "--ckpt", ckpt, "--prompt-tokens", "5,9,2,7",
          "--max-new", "12", "--max-seq", "64", "--eagle", draft,
          "--gamma", "3"])
    spec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert spec["tokens"] == plain["tokens"], (spec["tokens"], plain["tokens"])
    assert spec["metrics"]["spec_acceptance_rate"] >= 0.0


@pytest.mark.slow
def test_cli_gpt_neox_convert_then_generate(tmp_path, capsys):
    """convert auto-detects the gpt_neox.* namespace (fused interleaved
    query_key_value, biased LayerNorms/MLP) and the restored engine decodes."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    torch.manual_seed(0)
    hf = GPTNeoXForCausalLM(GPTNeoXConfig(
        vocab_size=64, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=64, rotary_pct=0.25,
        use_parallel_residual=True, tie_word_embeddings=False,
        hidden_act="gelu")).eval().float()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    wpath = tmp_path / "weights.npz"
    np.savez(wpath, **sd)
    cpath = tmp_path / "config.json"
    cpath.write_text(json.dumps({
        "vocab_size": 64, "hidden_size": 64, "intermediate_size": 256,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 4, "max_position_embeddings": 64,
        "norm_type": "layernorm", "parallel_block": True,
        "mlp_gated": False, "mlp_bias": True, "attention_bias": True,
        "attention_out_bias": True, "hidden_act": "gelu",
        "partial_rotary_factor": 0.25}))
    out = str(tmp_path / "ckpt")
    main(["convert", "--weights", str(wpath), "--config", str(cpath),
          "--mode", "dynamic", "--out", out])
    capsys.readouterr()
    main(["generate", "--ckpt", out, "--prompt-tokens", "5,9,2",
          "--max-new", "8", "--max-seq", "64"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(rec["tokens"]) == 8 and all(0 <= t < 64 for t in rec["tokens"])


@pytest.mark.slow
def test_cli_draft_ckpt_speculation_exact(weights_and_config, capsys):
    """generate --draft-ckpt produces the exact plain greedy stream
    (speculation plumbing through the CLI surface)."""
    tmp, wpath, cpath = weights_and_config
    ck = str(tmp / "spec_target")
    main(["convert", "--weights", wpath, "--config", cpath, "--out", ck])
    capsys.readouterr()

    main(["generate", "--ckpt", ck, "--prompt-tokens", "5,9,2,7",
          "--max-new", "10", "--max-seq", "64"])
    plain = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    main(["generate", "--ckpt", ck, "--prompt-tokens", "5,9,2,7",
          "--max-new", "10", "--max-seq", "64", "--draft-ckpt", ck,
          "--gamma", "3"])
    spec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert spec["tokens"] == plain["tokens"]
    # Self-draft accepts everything: far fewer engine steps.
    assert spec["metrics"]["spec_acceptance_rate"] > 0.9


@pytest.mark.slow
def test_cli_kv_bits_6_routes_to_k4v8(weights_and_config, capsys):
    """--kv-bits 6 serves the K4V8 mixed tier (round 5: the dominant 6-bit
    design; K8V4 demoted) and decodes a valid greedy stream."""
    tmp, wpath, cpath = weights_and_config
    out = str(tmp / "ckpt_kv6")
    main(["convert", "--weights", wpath, "--config", cpath, "--mode",
          "dynamic", "--out", out])
    capsys.readouterr()
    main(["generate", "--ckpt", out, "--prompt-tokens", "5,9,2,7",
          "--max-new", "8", "--max-seq", "64", "--kv-bits", "6"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(rec["tokens"]) == 8
    assert all(0 <= t < 64 for t in rec["tokens"])


@pytest.mark.slow
def test_cli_eagle_tree_generate_exact(weights_and_config, capsys):
    """--eagle-tree J serves the EAGLE-2-style tree tick and reproduces
    the plain greedy stream exactly (untrained draft: junk proposals,
    never wrong tokens)."""
    tmp, wpath, cpath = weights_and_config
    ckpt = str(tmp / "ckpt_eagle_tree")
    main(["convert", "--weights", wpath, "--config", cpath, "--mode",
          "dynamic", "--out", ckpt])
    capsys.readouterr()
    main(["generate", "--ckpt", ckpt, "--prompt-tokens", "5,9,2,7",
          "--max-new", "10", "--max-seq", "64"])
    plain = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    draft = str(tmp / "eagle_tree_draft")
    main(["eagle-train", "--ckpt", ckpt, "--out", draft,
          "--steps", "5", "--lr", "3e-3", "--prompt-tokens", "5,9,2,7",
          "--distill-len", "30"])
    capsys.readouterr()
    main(["generate", "--ckpt", ckpt, "--prompt-tokens", "5,9,2,7",
          "--max-new", "10", "--max-seq", "64", "--eagle", draft,
          "--gamma", "3", "--eagle-tree", "3"])
    spec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert spec["tokens"] == plain["tokens"], (spec["tokens"], plain["tokens"])


@pytest.mark.slow
def test_cli_best_int4_recipe_convert_then_generate(weights_and_config,
                                                    capsys):
    """The measured best-int4 recipe is reachable end-to-end from the CLI
    (BASELINE.md ladder v2 decision 9a): g64 + smooth -> AWQ -> GPTQ.
    Each calibration stage must actually change the written checkpoint
    relative to plain int4 (sanity that the flags do something)."""
    tmp, wpath, cpath = weights_and_config
    out = str(tmp / "ckpt_best4")
    main(["convert", "--weights", wpath, "--config", cpath,
          "--mode", "weight_only_int4", "--int4-group", "64",
          "--smooth-alpha", "0.5", "--awq", "--gptq",
          "--calib-tokens", "5,9,2,7,1,3,8,8,4,4,2,9,5,1,7,3",
          "--out", out])
    capsys.readouterr()
    main(["generate", "--ckpt", out, "--prompt-tokens", "5,9,2,7",
          "--max-new", "8", "--max-seq", "64"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(rec["tokens"]) == 8
    assert all(0 <= t < 64 for t in rec["tokens"])

    plain = str(tmp / "ckpt_plain4")
    main(["convert", "--weights", wpath, "--config", cpath,
          "--mode", "weight_only_int4", "--int4-group", "64",
          "--out", plain])
    capsys.readouterr()
    from protoquant_tpu.cli import _restore_model

    _, p_best = _restore_model(out)
    _, p_plain = _restore_model(plain)
    import jax

    leaves_b = jax.tree_util.tree_leaves(p_best)
    leaves_p = jax.tree_util.tree_leaves(p_plain)
    assert any(
        a.shape == b.shape and not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves_b, leaves_p)
    )


def test_cli_awq_requires_calib_tokens(weights_and_config):
    tmp, wpath, cpath = weights_and_config
    with pytest.raises(SystemExit, match="calib-tokens"):
        main(["convert", "--weights", wpath, "--config", cpath,
              "--mode", "weight_only_int4", "--awq",
              "--out", str(tmp / "x")])
