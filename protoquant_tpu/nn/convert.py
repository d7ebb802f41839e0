"""Model conversion: the `qlinear_from_linear` analogue (reference R4).

The reference walks a torch module tree and swaps eligible ``nn.Linear``
instances in place (SURVEY.md §3.1). In JAX, model structure and weights are
separate: the module tree is built with ``QLinear(mode=...)`` and conversion
is a *params-pytree transform* — every ``{"kernel": W}`` subtree belonging to
a linear becomes ``{"qkernel": QTensor.quantize(W, axis=0)}``. One jitted,
shardable program; each host quantizes only its own weight shards under pjit
(SURVEY.md §3.5).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp

from ..core.qtensor import QTensor
from ..utils.config import QuantConfig


def _is_linear_params(subtree: Any) -> bool:
    # ndim 2: QLinear / flax Dense. ndim 3: stacked MoE expert weights
    # [E, K, N] (models/moe.py::_StackedWeight) — quantized along axis=1
    # (per-expert per-output-channel scales [E, N]).
    return (
        isinstance(subtree, Mapping)
        and "kernel" in subtree
        and isinstance(subtree["kernel"], jnp.ndarray)
        and subtree["kernel"].ndim in (2, 3)
    )


def _skip(path: str, cfg: QuantConfig) -> bool:
    # MoE routers stay full-precision structurally: their argmax decides
    # WHICH expert runs — quantization noise there reroutes tokens, a far
    # larger error than matmul rounding — and MoEMLP's nn.Dense("gate")
    # expects an fp kernel param. (The exact segment "gate"; the dense MLP's
    # gate_proj does not match.)
    if path.split("/")[-1] == "gate":
        return True
    return any(path.endswith(pat) or pat in path for pat in cfg.skip_patterns)


def quantize_params(params: Any, cfg: QuantConfig | None = None, _path: str = ""):
    """fp params tree -> quantized params tree for the same model run with
    ``mode="dynamic"`` / ``"weight_only"``.

    Any dict subtree of the form {"kernel": [K,N], ...} (flax Dense / QLinear
    mode="fp" layout) is converted to {"qkernel": QTensor, ...} with
    per-output-channel scales, unless its path matches cfg.skip_patterns.
    """
    cfg = cfg or QuantConfig()
    if cfg.mode == "fp":
        return params
    if _is_linear_params(params) and not _skip(_path, cfg):
        out = dict(params)
        w = out.pop("kernel")
        if w.ndim == 3:
            # Stacked MoE experts [E, K, N]: per-expert channelwise int8/fp8
            # (axis=1) or per-expert group-packed int4 (packed storage only:
            # the batched wo4 path unpacks nibbles in VMEM per expert).
            if cfg.mode == "weight_only_fp8":
                from ..core.qtensor import QTensorF8

                out["qkernel"] = QTensorF8.quantize(w, axis=1)
            elif cfg.mode == "weight_only_int4":
                from ..core.qtensor import QTensor4
                from .qlinear import pick_int4_group

                group = pick_int4_group(w.shape[1], cfg.int4_group)
                out["qkernel"] = QTensor4.quantize(
                    w, group=group, storage="packed", clip=cfg.int4_clip
                )
            else:
                out["qkernel"] = QTensor.quantize(w, axis=1)
        elif cfg.mode == "weight_only_fp8":
            from ..core.qtensor import QTensorF8

            out["qkernel"] = QTensorF8.quantize(w, axis=0, group=cfg.fp8_group)
        elif cfg.mode in ("weight_only_int4", "dynamic_int4"):
            from ..core.qtensor import QTensor4
            from .qlinear import pick_int4_group

            group = pick_int4_group(w.shape[0], cfg.int4_group)
            # dynamic_int4 (W4A8) consumes the byte-packed layout only (the
            # int8-MXU kernel unpacks nibbles in VMEM).
            storage = (
                "packed" if cfg.mode == "dynamic_int4" else cfg.int4_storage
            )
            out["qkernel"] = QTensor4.quantize(
                w, group=group, storage=storage, clip=cfg.int4_clip
            )
        else:
            out["qkernel"] = QTensor.quantize(w, axis=0)
            if cfg.mode == "static" and w.ndim == 2:
                # Per-tensor activation scale placeholder (identity until
                # nn/static.py calibration fills it — serving with 1.0 is
                # valid but clips; calibrate before shipping).
                out["act_scale"] = jnp.ones((), jnp.float32)
        return out
    if isinstance(params, Mapping):
        return {
            k: quantize_params(v, cfg, f"{_path}/{k}" if _path else k)
            for k, v in params.items()
        }
    return params


def dequantize_params(params: Any) -> Any:
    """Inverse structural transform (lossy): QTensor -> fp kernel."""
    if isinstance(params, Mapping):
        if "qkernel" in params and hasattr(params["qkernel"], "dequantize"):
            out = dict(params)
            qt = out.pop("qkernel")
            out["kernel"] = qt.dequantize()
            return out
        return {k: dequantize_params(v) for k, v in params.items()}
    return params


def quantized_bytes(params: Any) -> int:
    """Total parameter bytes after quantization (observability helper)."""
    total = 0

    def visit(x):
        nonlocal total
        if hasattr(x, "nbytes") and callable(getattr(x, "nbytes")) and not isinstance(
            x, jnp.ndarray
        ):  # QTensor / QTensor4
            total += x.nbytes()
        elif isinstance(x, jnp.ndarray):
            total += x.size * x.dtype.itemsize
        elif isinstance(x, Mapping):
            for v in x.values():
                visit(v)

    visit(params)
    return total
