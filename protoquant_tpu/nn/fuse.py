"""Projection fusion: q/k/v -> qkv, gate/up -> gate_up (params transform).

Concatenating column-parallel weights along their output axis is *exact*
for every quantization mode here: per-output-channel int8 scales and
per-(group, channel) int4 scales concatenate along the same axis, and the
shared dynamic rowquant of the input is unchanged — the fused matmul
computes bit-for-bit the same columns as the three separate ones.

Apply to the *fp* params tree (before quantize_params), then run the model
with ``fused=True``.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp


def _fuse_kernels(subtrees: list, name: str) -> dict:
    for t in subtrees:
        extra = set(t.keys()) - {"kernel", "bias"}
        if extra:
            raise ValueError(
                f"fuse_projections({name}): cannot fuse layers with extra "
                f"params {sorted(extra)}"
            )
    has_bias = ["bias" in t for t in subtrees]
    if any(has_bias) and not all(has_bias):
        raise ValueError(
            f"fuse_projections({name}): all-or-none biases required to fuse"
        )
    kernels = [t["kernel"] for t in subtrees]
    out = {"kernel": jnp.concatenate(kernels, axis=1)}
    if all(has_bias):
        # Per-output-channel biases concatenate along the same axis — exact.
        out["bias"] = jnp.concatenate([t["bias"] for t in subtrees])
    return out


def fuse_projections(params: Any) -> Any:
    """fp params tree (q_proj/k_proj/v_proj, gate_proj/up_proj) -> fused tree
    (qkv_proj, gate_up_proj). o_proj/down_proj untouched."""

    def walk(tree):
        if not isinstance(tree, Mapping):
            return tree
        out = {}
        keys = set(tree.keys())
        if {"q_proj", "k_proj", "v_proj"} <= keys:
            out["qkv_proj"] = _fuse_kernels(
                [tree["q_proj"], tree["k_proj"], tree["v_proj"]], "qkv"
            )
            keys -= {"q_proj", "k_proj", "v_proj"}
        if {"gate_proj", "up_proj"} <= keys:
            out["gate_up_proj"] = _fuse_kernels(
                [tree["gate_proj"], tree["up_proj"]], "gate_up"
            )
            keys -= {"gate_proj", "up_proj"}
        for k in keys:
            out[k] = walk(tree[k])
        return out

    return walk(params)
