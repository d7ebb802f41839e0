"""AWQ-style activation-aware scale search (calibration pass).

Third leg of the calibration toolkit (nn/smooth.py migrates outliers with a
fixed formula, nn/gptq.py compensates rounding error row-by-row). SmoothQuant
picks per-input-channel migration factors by the closed form
``s = act^alpha / w^(1-alpha)`` with one global alpha; AWQ (Lin et al., 2023,
"Activation-aware Weight Quantization") observes that the right amount of
migration is *layer-dependent* and that what matters is the measured output
error of the actually-quantized weights. It keeps the same
fold-into-the-producer trick but chooses the scales by grid search:

    s(alpha)[k] = (act_amax[k] / gmean(act_amax))^alpha,  alpha in [0, 1]
    L(alpha)    = sum_proj || (X / s) @ qdq(diag(s) W_proj) - X @ W_proj ||^2

per norm-fed projection group, where ``qdq`` is quantize+dequantize under the
TARGET QuantConfig (int8 / grouped-int4 / fp8) and X are calibration
activations captured at the norm output. alpha=0 is the identity transform,
so on the calibration set the search never loses to the unscaled baseline.
The chosen scales fold into the preceding RMSNorm exactly like SmoothQuant —
zero runtime cost, the quantized graph is unchanged.

The objective quantizes only weights (AWQ's weight-only framing). In
``dynamic`` mode the activation quantizer also benefits (x/s is flatter —
the SmoothQuant effect) but the search criterion stays the weight-side
output error, which dominates in practice.

Scope mirrors nn/smooth.py: the norm-fed groups (q/k/v or fused qkv;
gate/up or fused gate_up; MoE stacked w1/w3 + router). For stacked experts
the error is evaluated on a subsample of experts (all of them see the same
normed activations; the scale is shared). o_proj/down_proj have no foldable
producer and are left as-is, matching the original technique.

Run BEFORE nn.convert.quantize_params (or nn.gptq.gptq_params), on fp params:

    aparams = awq_quantize(fp_model, params, calib_tokens, qcfg)
    qparams = quantize_params(aparams, qcfg)
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from ..utils.config import QuantConfig
from .smooth import _fold_into_norm, _mlp_norm_name, _scale_kernel

DEFAULT_GRID = 20


def collect_norm_outputs(model, params, tokens, max_tokens: int = 2048) -> dict:
    """Full activations (not just amax) at every RMSNorm output.

    Returns {layer_scope: {norm_name: X [S, D] np.f32}} with S = B*T capped
    at ``max_tokens`` (uniform stride subsample — calibration sets are small,
    this bounds host memory on long captures).
    """
    from ..models.llama import RMSNorm  # deferred: models imports nn

    if getattr(model, "mode", "fp") != "fp":
        raise ValueError("calibrate on the fp model (mode='fp')")
    _, state = model.apply(
        params,
        tokens,
        capture_intermediates=lambda mdl, method: isinstance(mdl, RMSNorm),
    )
    outs: dict = {}
    # Only the norms awq_params consumes — materializing q_norm/k_norm/final
    # norm outputs would cost max_tokens × width f32 host memory per unused
    # norm per layer on large models.
    used = ("input_layernorm", "post_attention_layernorm",
            "pre_feedforward_layernorm")

    def walk(scope, node, layer_key):
        for name, sub in node.items():
            if name == "__call__":
                if scope not in used:
                    continue
                x = np.asarray(sub[0], np.float32).reshape(-1, sub[0].shape[-1])
                if x.shape[0] > max_tokens:
                    x = x[:: -(-x.shape[0] // max_tokens)]
                outs.setdefault(layer_key, {})[scope] = x
            elif isinstance(sub, dict):
                walk(name, sub, layer_key if not name.startswith("layers_") else name)

    walk("", state["intermediates"], "")
    return outs


def _qdq(W: np.ndarray, cfg: QuantConfig) -> np.ndarray:
    """Quantize+dequantize a [K, N] kernel under the target config (the
    error the grid search scores is exactly the deployment error)."""
    from ..core.qtensor import QTensor, QTensor4, QTensorF8
    from .qlinear import pick_int4_group

    Wj = jnp.asarray(W)
    if cfg.mode == "weight_only_int4":
        group = pick_int4_group(W.shape[0], cfg.int4_group)
        qt = QTensor4.quantize(Wj, group=group, storage="packed",
                               clip=cfg.int4_clip)
    elif cfg.mode == "weight_only_fp8":
        qt = QTensorF8.quantize(Wj, axis=0)
    else:  # dynamic / weight_only share the int8 weight scheme
        qt = QTensor.quantize(Wj, axis=0)
    return np.asarray(qt.dequantize(), np.float32)


def _qdq_rows(X: np.ndarray) -> np.ndarray:
    """Per-token symmetric int8 qdq (the dynamic-activation contract,
    core/numerics.py) — numpy twin for the host-side search."""
    from ..core.numerics import QMAX, SCALE_EPS

    s = np.maximum(np.abs(X).max(axis=1, keepdims=True) / QMAX, SCALE_EPS)
    return np.clip(np.rint(X / s), -QMAX, QMAX) * s


def _group_loss(X: np.ndarray, kernels: list, s: np.ndarray,
                cfg: QuantConfig) -> float:
    """L(s) = sum over group kernels of ||qdq_x(X/s) @ qdq(s*W) - X @ W||^2.

    In ``dynamic`` mode the activations are per-token int8 too, so the
    search scores the FULL deployment error — migrating outliers into the
    weights (the SmoothQuant effect) then shows up in the objective. In
    weight-only modes qdq_x is the identity (AWQ's original framing).
    """
    Xs = X / s
    if cfg.mode == "dynamic":
        Xs = _qdq_rows(Xs)
    loss = 0.0
    for W in kernels:
        ref = X @ W
        q = _qdq(W * s[:, None], cfg)
        d = Xs @ q - ref
        loss += float(np.dot(d.ravel(), d.ravel()))
    return loss


def search_scale(X: np.ndarray, kernels: list, cfg: QuantConfig,
                 n_grid: int = DEFAULT_GRID, eps: float = 1e-5):
    """Grid-search the migration exponent for one projection group.

    ``kernels`` are [K, N] np.f32 views of every quantized consumer of X.
    Returns (s [K] np.f32, best_alpha). alpha=0 yields s=1 (identity), so
    the result never scores worse than no-op on the calibration set.
    """
    amax = np.abs(X).max(axis=0)
    live = amax > eps
    if not live.any():
        return np.ones_like(amax), 0.0
    # Normalize by the geometric mean of live channels so s is centred
    # around 1 (pure redistribution; no global drift into the norm weight).
    gmean = float(np.exp(np.mean(np.log(np.maximum(amax[live], eps)))))
    ratio = np.maximum(amax, eps) / max(gmean, eps)
    best_s, best_alpha, best_loss = np.ones_like(amax), 0.0, None
    for i in range(n_grid + 1):
        alpha = i / n_grid
        s = np.clip(ratio**alpha, 1e-4, 1e4).astype(np.float32)
        s[~live] = 1.0
        loss = _group_loss(X, kernels, s, cfg)
        if best_loss is None or loss < best_loss:
            best_s, best_alpha, best_loss = s, alpha, loss
    return best_s, best_alpha


def awq_params(params, norm_outputs: dict, cfg: QuantConfig | None = None,
               unit_offset: bool = False, n_grid: int = DEFAULT_GRID,
               max_experts: int = 4):
    """Return AWQ-scaled fp params (input unchanged) plus the per-group
    chosen alphas {(layer, group): alpha} for observability."""
    import jax

    cfg = cfg or QuantConfig()
    tree = jax.tree_util.tree_map(lambda a: a, params)  # leaf-sharing copy
    root = tree["params"] if "params" in tree else tree
    alphas: dict = {}

    for lname, layer in root.items():
        if not lname.startswith("layers_") or lname not in norm_outputs:
            continue
        louts = norm_outputs[lname]

        # --- attention group: input_layernorm -> q/k/v (or fused qkv) ------
        attn = layer.get("self_attn", {})
        names = [n for n in ("q_proj", "k_proj", "v_proj", "qkv_proj")
                 if n in attn]
        if names and "input_layernorm" in louts:
            X = louts["input_layernorm"]
            kerns = [np.asarray(attn[n]["kernel"], np.float32) for n in names]
            s, a = search_scale(X, kerns, cfg, n_grid)
            alphas[(lname, "attn")] = a
            sj = jnp.asarray(s)
            layer["input_layernorm"] = _fold_into_norm(
                layer["input_layernorm"], sj, unit_offset
            )
            for n in names:
                attn[n] = {**attn[n],
                           "kernel": _scale_kernel(attn[n]["kernel"], sj)}

        # --- MLP group (None on post-norm layers: no foldable producer) -----
        mnorm = _mlp_norm_name(layer)
        if mnorm is None or mnorm not in louts:
            continue
        X = louts[mnorm]
        if "mlp" in layer:
            mlp = layer["mlp"]
            names = [n for n in ("gate_proj", "up_proj", "gate_up_proj")
                     if n in mlp]
            if not names:
                continue
            kerns = [np.asarray(mlp[n]["kernel"], np.float32) for n in names]
            s, a = search_scale(X, kerns, cfg, n_grid)
            alphas[(lname, "mlp")] = a
            sj = jnp.asarray(s)
            layer[mnorm] = _fold_into_norm(layer[mnorm], sj, unit_offset)
            for n in names:
                mlp[n] = {**mlp[n],
                          "kernel": _scale_kernel(mlp[n]["kernel"], sj)}
        elif "block_sparse_moe" in layer:
            moe = layer["block_sparse_moe"]
            # Error objective over a subsample of stacked experts (the scale
            # is shared across all of them); the fold applies to every
            # consumer including the fp router (required for the identity).
            w1 = np.asarray(moe["w1"]["kernel"], np.float32)
            w3 = np.asarray(moe["w3"]["kernel"], np.float32)
            sub = list(w1[:max_experts]) + list(w3[:max_experts])
            s, a = search_scale(X, sub, cfg, n_grid)
            alphas[(lname, "moe")] = a
            sj = jnp.asarray(s)
            layer[mnorm] = _fold_into_norm(layer[mnorm], sj, unit_offset)
            for n in ("w1", "w3", "gate"):
                moe[n] = {**moe[n],
                          "kernel": _scale_kernel(moe[n]["kernel"], sj)}

    return tree, alphas


def awq_quantize(model, params, calib_tokens, cfg: QuantConfig | None = None,
                 n_grid: int = DEFAULT_GRID) -> dict:
    """One-call calibration: capture norm outputs on the fp model, grid-search
    per-group migration scales against the target quant config, and return
    AWQ-scaled fp params ready for nn.convert.quantize_params."""
    outs = collect_norm_outputs(model, params, calib_tokens)
    scaled, _ = awq_params(
        params,
        outs,
        cfg=cfg,
        unit_offset=model.cfg.rmsnorm_unit_offset,
        n_grid=n_grid,
    )
    return scaled
