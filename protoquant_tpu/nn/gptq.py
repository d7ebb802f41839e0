"""GPTQ-style error-compensated weight rounding (calibration pass).

Quality tooling beyond the reference's round-to-nearest scheme (SURVEY.md
§1.2 fixes the RTN numerics contract; this is an optional conversion-time
upgrade that keeps the exact same runtime layout). Plain rounding minimizes
per-element weight error; what inference cares about is OUTPUT error
||X(W - Q)||^2 = tr((W-Q)^T H (W-Q)) with H = X^T X over calibration
activations. GPTQ (Frantar et al., 2022) walks the input dimension in
order, rounds one row at a time, and redistributes each row's rounding
error over the not-yet-quantized rows via the Cholesky factor of H^-1 —
the greedy OBS update. Same int8/int4/fp8 payloads out, strictly lower
proxy loss (asserted in tests), no inference-time cost.

Usage:
    grams   = collect_grams(fp_model, params, calib_tokens)
    qparams = gptq_params(params, grams, QuantConfig(mode=...))

Scope: 2D linear kernels. Stacked MoE expert weights [E, K, N] fall back to
plain quantization (per-expert token routing makes their calibration sets
expert-dependent; future work). Composes with nn.smooth (smooth first,
collect grams on the smoothed model, then gptq_params the smoothed params).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..core.numerics import QMAX, QMAX4, SCALE_EPS
from ..core.qtensor import QTensor, QTensor4, QTensorF8, _E4M3_MAX
from ..utils.config import QuantConfig


def collect_grams(model, params, tokens) -> dict:
    """Run the fp model on calibration ``tokens`` [B, T] and return
    {"layers_0/self_attn/q_proj": H [K, K] np.f32, ...} — one Gram matrix
    (sum over tokens of x x^T) per QLinear, keyed by parameter path."""
    from . import qlinear as _ql

    if getattr(model, "mode", "fp") != "fp":
        raise ValueError("calibrate on the fp model (mode='fp')")
    _ql.CALIB_MODE = True
    try:
        _, state = model.apply(params, tokens, mutable=["calib"])
    finally:
        _ql.CALIB_MODE = False

    n_samples = int(np.prod(tokens.shape))
    grams: dict = {}

    def walk(node, path):
        for name, sub in node.items():
            if name == "gram":
                g = sub[0] if isinstance(sub, (tuple, list)) else sub
                grams[path] = np.asarray(g, np.float32)
            elif isinstance(sub, Mapping):
                walk(sub, f"{path}/{name}" if path else name)

    walk(state["calib"], "")
    k_max = max(g.shape[0] for g in grams.values()) if grams else 0
    if n_samples < 2 * k_max:
        import warnings

        # Rank-deficient Grams make GPTQ OVERFIT: error lands in the
        # calibration null space and resurfaces on fresh inputs (measured —
        # see tests/test_gptq.py fixture note). Calibrate with at least
        # ~2x max-in-features tokens.
        warnings.warn(
            f"GPTQ calibration has {n_samples} tokens for K up to {k_max}; "
            "expect overfit below ~2*K tokens",
            stacklevel=2,
        )
    return grams


def _gptq_rounds(W: np.ndarray, H: np.ndarray, quant_row, dequant_row,
                 new_scale_block=None, group: int = 0):
    """Core GPTQ loop. W [K, N] is consumed destructively (pass a copy).

    quant_row(w_k, k) -> stored row; dequant_row(q_k, k) -> fp row;
    new_scale_block(W, k), when given, refreshes group scales from the
    CURRENT (error-compensated) residual weights at each group boundary.
    Returns the stored rows stacked [K, N].
    """
    K, _ = W.shape
    # Damped inverse-Hessian Cholesky (upper), per the standard recipe; a
    # couple of damping retries cover rank-deficient calibration sets.
    damp = 0.01 * float(np.mean(np.diag(H))) + 1e-8
    for _ in range(8):
        try:
            Hinv = np.linalg.inv(H + damp * np.eye(K, dtype=H.dtype))
            U = np.linalg.cholesky(Hinv).T  # upper triangular
            break
        except np.linalg.LinAlgError:
            damp *= 10.0
    else:  # pragma: no cover
        raise np.linalg.LinAlgError("Hessian not invertible at any damping")

    Q = [None] * K
    for k in range(K):
        if new_scale_block is not None and group and k % group == 0:
            new_scale_block(W, k)
        w = W[k]
        q = quant_row(w, k)
        Q[k] = q
        err = (w - dequant_row(q, k)) / U[k, k]
        if k + 1 < K:
            W[k + 1 :] -= np.outer(U[k, k + 1 :], err)
    return np.stack(Q, axis=0)


def _gptq_int8(W: np.ndarray, H: np.ndarray) -> QTensor:
    """Per-output-channel int8 (the reference scheme) with GPTQ rounding.
    Scales come from the ORIGINAL weights (per-channel amax, exactly the
    RTN contract) so only the rounding decisions change."""
    s = np.maximum(np.max(np.abs(W), axis=0) / QMAX, SCALE_EPS).astype(np.float32)
    q = _gptq_rounds(
        W.astype(np.float32).copy(),
        H,
        lambda w, k: np.clip(np.rint(w / s), -QMAX, QMAX).astype(np.int8),
        lambda qr, k: qr.astype(np.float32) * s,
    )
    return QTensor(
        data=jnp.asarray(q, jnp.int8), scale=jnp.asarray(s), axis=0,
        orig_dtype_name=np.dtype(W.dtype).name,
    )


def _gptq_int4(W: np.ndarray, H: np.ndarray, group: int,
               storage: str) -> QTensor4:
    """Group-wise int4 with GPTQ rounding; group scales are refreshed from
    the error-compensated residual at each group boundary (amax — the
    residual updates make mse-clip's clipped tails unrecoverable)."""
    from ..core import numerics

    K, N = W.shape
    scales = np.zeros((K // group, N), np.float32)

    def refresh(Wcur, k):
        blk = Wcur[k : k + group]
        scales[k // group] = np.maximum(
            np.max(np.abs(blk), axis=0) / QMAX4, SCALE_EPS
        )

    q = _gptq_rounds(
        W.astype(np.float32).copy(),
        H,
        lambda w, k: np.clip(
            np.rint(w / scales[k // group]), -QMAX4, QMAX4
        ).astype(np.int8),
        lambda qr, k: qr.astype(np.float32) * scales[k // group],
        new_scale_block=refresh,
        group=group,
    )
    qj = jnp.asarray(q, jnp.int8)
    data = (
        qj.astype(jnp.int4) if storage == "native"
        else numerics.pack_int4(qj, group)
    )
    return QTensor4(
        data=data, scale=jnp.asarray(scales), group=group, orig_k=K,
        orig_dtype_name=np.dtype(W.dtype).name,
    )


def _gptq_fp8(W: np.ndarray, H: np.ndarray) -> QTensorF8:
    """Per-output-channel e4m3 with GPTQ error feedback (the 'rounding' is
    the f8 cast; feedback still lowers output error on correlated inputs)."""
    import ml_dtypes

    s = np.maximum(
        np.max(np.abs(W), axis=0) / _E4M3_MAX, 1e-12
    ).astype(np.float32)
    q = _gptq_rounds(
        W.astype(np.float32).copy(),
        H,
        lambda w, k: (w / s).astype(ml_dtypes.float8_e4m3fn),
        lambda qr, k: qr.astype(np.float32) * s,
    )
    return QTensorF8(
        data=jnp.asarray(q), scale=jnp.asarray(s), axis=0,
        orig_dtype_name=np.dtype(W.dtype).name,
    )


def gptq_params(params: Any, grams: dict, cfg: QuantConfig | None = None,
                _path: str = "") -> Any:
    """quantize_params twin with GPTQ rounding wherever a Gram matrix is
    available; falls back to plain quantization elsewhere (stacked MoE
    experts, skip-listed layers, linears the calibration never touched)."""
    from .convert import _is_linear_params, _skip, quantize_params
    from .qlinear import pick_int4_group

    cfg = cfg or QuantConfig()
    if cfg.mode == "fp":
        return params
    if _is_linear_params(params) and not _skip(_path, cfg):
        w = params["kernel"]
        key = _path.removeprefix("params/")
        H = grams.get(key)
        if w.ndim != 2 or H is None:
            return quantize_params(params, cfg)
        out = dict(params)
        Wnp = np.asarray(out.pop("kernel"), np.float32)
        if cfg.mode == "weight_only_int4":
            group = pick_int4_group(Wnp.shape[0], cfg.int4_group)
            out["qkernel"] = _gptq_int4(Wnp, H, group, cfg.int4_storage)
        elif cfg.mode == "weight_only_fp8":
            out["qkernel"] = _gptq_fp8(Wnp, H)
        else:  # dynamic / weight_only share the int8 weight scheme
            out["qkernel"] = _gptq_int8(Wnp, H)
        return out
    if isinstance(params, Mapping):
        return {
            k: gptq_params(v, grams, cfg, f"{_path}/{k}" if _path else k)
            for k, v in params.items()
        }
    return params
