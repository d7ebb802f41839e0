"""SmoothQuant-style activation-outlier migration (calibration pass).

Quality tooling beyond the reference's scope (protoquant quantizes weights
as-is; SURVEY.md §1.2 fixes only the numerics contract). Dynamic per-token
activation quantization spends its 8 bits on the largest channel of each
token — a handful of outlier channels (ubiquitous in trained LLMs) inflate
every token's scale and drown the small channels in rounding noise.

SmoothQuant (Xiao et al., 2022) migrates that difficulty into the weights,
where per-output-channel scales absorb it for free. For every norm-fed
projection group, pick per-input-channel factors

    s_k = amax_act[k]^alpha / amax_w[k]^(1-alpha)

and rewrite  y = (x / s) @ (diag(s) W)  — mathematically an identity, but the
quantizer now sees x/s (outliers flattened) and diag(s)W (outliers absorbed
into the per-channel weight scales). The division by s folds into the
preceding RMSNorm weight, so inference cost is exactly zero: no new ops, the
quantized graph is unchanged.

Applies to the norm-fed groups (q/k/v or fused qkv; gate/up or fused
gate_up; MoE router + stacked expert w1/w3). o_proj/down_proj inputs are
attention/GLU outputs with no foldable producer — left as-is, matching the
original technique's scope.

Run BEFORE nn.convert.quantize_params, on fp params.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def collect_activation_stats(model, params, tokens) -> dict:
    """Per-channel activation amax at every RMSNorm output.

    ``model`` must be the fp-mode model (calibration sees unquantized
    activations). Returns {layer_scope: {norm_name: amax[D] f32}} — e.g.
    stats["layers_0"]["input_layernorm"].
    """
    from ..models.llama import RMSNorm  # deferred: models imports nn

    if getattr(model, "mode", "fp") != "fp":
        raise ValueError("calibrate on the fp model (mode='fp')")
    _, state = model.apply(
        params,
        tokens,
        capture_intermediates=lambda mdl, method: isinstance(mdl, RMSNorm),
    )
    stats: dict = {}
    inter = state["intermediates"]

    def walk(scope, node, layer_key):
        for name, sub in node.items():
            if name == "__call__":
                out = sub[0]
                amax = jnp.max(
                    jnp.abs(out.astype(jnp.float32)),
                    axis=tuple(range(out.ndim - 1)),
                )
                stats.setdefault(layer_key, {})[scope] = amax
            elif isinstance(sub, dict):
                walk(name, sub, layer_key if not name.startswith("layers_") else name)

    walk("", inter, "")
    return stats


def _scale_vector(act_amax, weights, alpha: float, eps: float) -> jnp.ndarray:
    """s_k = act^alpha / w^(1-alpha), guarded against dead channels."""
    w_amax = None
    for w in weights:
        # Reduce every axis except the input-channel axis:
        #   dense [K, N] -> axis 0 is K; stacked experts [E, K, N] -> axis 1.
        k_axis = 0 if w.ndim == 2 else 1
        red = tuple(a for a in range(w.ndim) if a != k_axis)
        m = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=red)
        w_amax = m if w_amax is None else jnp.maximum(w_amax, m)
    act = jnp.maximum(act_amax.astype(jnp.float32), eps)
    wm = jnp.maximum(w_amax, eps)
    s = act**alpha / wm ** (1.0 - alpha)
    # Degenerate channels (never activated): leave untouched.
    s = jnp.where(act_amax <= eps, 1.0, s)
    return jnp.clip(s, 1e-5, 1e5)


def _fold_into_norm(norm_params, s, unit_offset: bool):
    w = norm_params["weight"]
    if unit_offset:
        # Gemma applies (1 + w): effective weight (1+w)/s, stored zero-centred.
        return {**norm_params, "weight": ((w + 1.0) / s - 1.0).astype(w.dtype)}
    return {**norm_params, "weight": (w / s).astype(w.dtype)}


def _scale_kernel(kern, s):
    k_axis = 0 if kern.ndim == 2 else 1
    shape = [1] * kern.ndim
    shape[k_axis] = -1
    return (kern.astype(jnp.float32) * s.reshape(shape)).astype(kern.dtype)


def _mlp_norm_name(layer: dict):
    """Name of the norm that PRODUCES the MLP input, or None if the layer
    has no foldable producer.

    Sandwich-norm models (Gemma-2/3) feed the MLP from
    pre_feedforward_layernorm; post_attention_layernorm there normalizes the
    attention OUTPUT. Post-norm models (OLMo-2) have NO pre-sublayer norms at
    all — post_attention_layernorm normalizes the attention output and the
    MLP reads the raw residual, so folding 1/s into it would scale the
    residual stream (not an identity). Detect that case by the absence of
    input_layernorm and skip the fold entirely.
    """
    if "pre_feedforward_layernorm" in layer:
        return "pre_feedforward_layernorm"
    if "input_layernorm" not in layer:
        return None  # post-norm layer: nothing feeds the MLP but the residual
    return "post_attention_layernorm"


def smooth_params(
    params, stats: dict, alpha: float = 0.5, unit_offset: bool = False,
    eps: float = 1e-5,
) -> dict:
    """Return smoothed fp params (input unchanged). See module docstring."""
    tree = jax.tree_util.tree_map(lambda a: a, params)  # leaf-sharing copy
    root = tree["params"] if "params" in tree else tree

    for lname, layer in root.items():
        if not lname.startswith("layers_") or lname not in stats:
            continue
        lstats = stats[lname]

        # --- attention group: input_layernorm -> q/k/v (or fused qkv) ------
        attn = layer.get("self_attn", {})
        names = [n for n in ("q_proj", "k_proj", "v_proj", "qkv_proj") if n in attn]
        if names and "input_layernorm" in lstats:
            s = _scale_vector(
                lstats["input_layernorm"],
                [attn[n]["kernel"] for n in names],
                alpha,
                eps,
            )
            layer["input_layernorm"] = _fold_into_norm(
                layer["input_layernorm"], s, unit_offset
            )
            for n in names:
                attn[n] = {**attn[n], "kernel": _scale_kernel(attn[n]["kernel"], s)}

        # --- MLP group: pre-MLP norm -> gate/up (or MoE) -------------------
        mnorm = _mlp_norm_name(layer)
        if mnorm is None or mnorm not in lstats:
            continue
        act = lstats[mnorm]
        if "mlp" in layer:
            mlp = layer["mlp"]
            names = [n for n in ("gate_proj", "up_proj", "gate_up_proj") if n in mlp]
            if not names:
                continue
            s = _scale_vector(act, [mlp[n]["kernel"] for n in names], alpha, eps)
            layer[mnorm] = _fold_into_norm(layer[mnorm], s, unit_offset)
            for n in names:
                mlp[n] = {**mlp[n], "kernel": _scale_kernel(mlp[n]["kernel"], s)}
        elif "block_sparse_moe" in layer:
            moe = layer["block_sparse_moe"]
            # Router + stacked expert gate/up all read the normed activation.
            consumers = [moe["w1"]["kernel"], moe["w3"]["kernel"],
                         moe["gate"]["kernel"]]
            s = _scale_vector(act, consumers, alpha, eps)
            layer[mnorm] = _fold_into_norm(layer[mnorm], s, unit_offset)
            for n in ("w1", "w3", "gate"):
                moe[n] = {**moe[n], "kernel": _scale_kernel(moe[n]["kernel"], s)}

    return tree


def smoothquant(model, params, calib_tokens, alpha: float = 0.5) -> dict:
    """One-call calibration: run the fp model on ``calib_tokens`` [B, T],
    collect norm-output amax stats, and return smoothed fp params ready for
    nn.convert.quantize_params."""
    stats = collect_activation_stats(model, params, calib_tokens)
    return smooth_params(
        params,
        stats,
        alpha=alpha,
        unit_offset=model.cfg.rmsnorm_unit_offset,
    )
