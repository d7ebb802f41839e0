"""Quant-quality observability + numerics debug mode (SURVEY.md §5.2, §5.5).

* ``sqnr_report`` — per-layer signal-to-quantization-noise of a quantized
  model vs its fp twin (flax capture_intermediates), for localizing accuracy
  regressions to a layer.
* ``assert_no_donation_drift`` — debug mode for the in-place/donated decode
  path: runs a step twice, with and without donation, and compares (the
  'race detection' analogue for XLA buffer aliasing, SURVEY.md §5.2).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def sqnr_db(ref: np.ndarray, test: np.ndarray) -> float:
    ref = np.asarray(ref, np.float64)
    test = np.asarray(test, np.float64)
    noise = np.sum((ref - test) ** 2)
    sig = np.sum(ref**2)
    if noise == 0:
        return float("inf")
    return float(10.0 * np.log10(sig / (noise + 1e-30)))


def sqnr_report(fp_model, fp_params, q_model, q_params, tokens) -> dict:
    """Per-layer-output SQNR (dB) of q_model vs fp_model on `tokens`."""
    _, fp_inter = fp_model.apply(
        fp_params, tokens, capture_intermediates=True, mutable=["intermediates"]
    )
    _, q_inter = q_model.apply(
        q_params, tokens, capture_intermediates=True, mutable=["intermediates"]
    )

    report = {}

    def walk(fp_tree, q_tree, path):
        if isinstance(fp_tree, dict):
            for k in fp_tree:
                if k in q_tree:
                    walk(fp_tree[k], q_tree[k], f"{path}/{k}" if path else k)
        elif isinstance(fp_tree, tuple) and len(fp_tree) > 0:
            a, b = fp_tree[0], q_tree[0]
            if hasattr(a, "shape") and hasattr(b, "shape") and a.shape == b.shape:
                report[path] = sqnr_db(
                    np.asarray(a, np.float32), np.asarray(b, np.float32)
                )

    walk(
        fp_inter["intermediates"],
        q_inter["intermediates"],
        "",
    )
    return report


def assert_no_donation_drift(step_fn, *args, atol=0.0):
    """Run `step_fn` with donation disabled (jax.jit without donate) and
    compare against the donated version's output. step_fn must be the
    *undonated* python callable; pass the donated outputs to compare."""
    # Reference execution on copies (no aliasing possible).
    copied = jax.tree_util.tree_map(
        lambda a: jnp.array(a, copy=True) if hasattr(a, "dtype") else a, args
    )
    ref = step_fn(*copied)
    out = step_fn(*args)
    ref_flat, _ = jax.tree_util.tree_flatten(ref)
    out_flat, _ = jax.tree_util.tree_flatten(out)
    for r, o in zip(ref_flat, out_flat):
        np.testing.assert_allclose(
            np.asarray(r, np.float32), np.asarray(o, np.float32), atol=atol
        )
    return out
