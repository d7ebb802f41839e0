"""Static activation quantization (W8A8-static) calibration.

Round 4 (VERDICT r3 item 8's line of attack on the prefill gap): the
dynamic path's rowquant amax is a REDUCTION over the live activation —
an unoverlappable VPU pass that costs ~15% of int8 prefill on this part
(BASELINE.md prefill overhead decomposition). A CALIBRATED per-tensor
activation scale removes the reduction entirely: what remains at
inference is elementwise multiply+round+cast, which XLA fuses into the
dot's operand stream (ops/xla_backend.py::static_qlinear_xla — the vLLM
W8A8-static recipe, TPU-shaped).

The trade is the usual static-quant one: a fixed scale clips activations
that exceed the calibration amax (mitigate with a safety ``margin``) and
spends resolution on the calibration set's worst token. SmoothQuant
(nn/smooth.py) is the natural partner — it flattens the outlier channels
that set the amax. Quality positioning lives on the quality ladder.

Usage:
    stats = calibrate_static(fp_model, fp_params, calib_tokens)
    qparams = quantize_params(maybe_smoothed, QuantConfig(mode="static"))
    qparams = attach_static_scales(qparams, stats)
    model = LlamaModel(cfg, mode="static")
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp

from . import qlinear as _ql


def calibrate_static(model, params, calib_tokens) -> dict:
    """One fp forward over ``calib_tokens`` with every QLinear sowing its
    input abs-max. Returns a nested dict mirroring the params tree with
    scalar ``act_amax`` leaves at each linear's scope."""
    if getattr(model, "mode", "fp") != "fp":
        raise ValueError("calibrate on the fp model (mode='fp')")
    _ql.STATIC_CALIB = True
    try:
        _, state = model.apply(params, calib_tokens, mutable=["calib"])
    finally:
        _ql.STATIC_CALIB = False
    return state["calib"]


def attach_static_scales(qparams: Any, stats: Mapping, *,
                         margin: float = 1.0) -> Any:
    """Fill the ``act_scale`` leaves of a mode="static" converted tree from
    calibration stats: scale = margin * amax / 127 (margin > 1 trades
    resolution for clip headroom on activations beyond the calibration
    set)."""

    def walk(qp, st):
        if isinstance(qp, Mapping):
            out = dict(qp)
            if "act_scale" in out and st is not None and "act_amax" in st:
                raw = st["act_amax"]
                if isinstance(raw, tuple):  # plain sow stores a tuple;
                    raw = raw[0]  # reduce_fn stores the reduced scalar
                amax = jnp.asarray(raw, jnp.float32)
                out["act_scale"] = jnp.maximum(
                    margin * amax / 127.0, 1e-12
                )
            for k, v in qp.items():
                if k == "act_scale":
                    continue
                sub = None
                if isinstance(st, Mapping):
                    sub = st.get(k)
                out[k] = walk(v, sub)
            return out
        return qp

    # stats tree: {"calib"-collection layout} mirrors params minus the
    # top-level "params" key.
    st = stats.get("calib", stats)
    inner = qparams.get("params", qparams)
    walked = walk(inner, st)
    if "params" in qparams:
        return {**qparams, "params": walked}
    return walked


def static_quantize(model, params, calib_tokens, qcfg=None, *,
                    margin: float = 1.0):
    """One-call convenience: calibrate on the fp model, convert, attach.
    ``qcfg`` defaults to QuantConfig(mode="static")."""
    from ..utils.config import QuantConfig
    from .convert import quantize_params

    qcfg = qcfg or QuantConfig(mode="static")
    if qcfg.mode != "static":
        raise ValueError("static_quantize needs mode='static'")
    stats = calibrate_static(model, params, calib_tokens)
    qp = quantize_params(params, qcfg)
    return attach_static_scales(qp, stats, margin=margin)
