"""LoRA adapters over quantized base weights (serving-side utilities).

Serving extension beyond the reference's scope: the standard recipe for
deploying fine-tunes without duplicating the base model — the base weight
stays int8/int4/fp8 in HBM, a rank-r fp adapter rides beside it:

    y = quantized_matmul(x, Wq) + (x @ A) @ B * (alpha / r)

The adapter path is O(r/N) of the base matmul cost and adds r*(K+N) fp32
params per projection. The forward lives in nn/qlinear.py (``lora_rank``
field — added pre-psum so TP row-parallelism reduces adapter partials with
the base partials); this module owns the params plumbing:

* ``attach_lora``: insert freshly initialized adapters (A ~ lecun, B = 0 —
  a zero-effect start) into an existing (quantized or fp) params tree.
* ``import_hf_lora``: load a PEFT-layout adapter state dict
  (``...layers.{i}.self_attn.q_proj.lora_A.weight`` [r, K], ``lora_B``
  [N, r]) into the tree.
* ``merge_lora``: fold adapters into fp kernels (W += A @ B * alpha/r) —
  the exactness oracle for tests and the export path back to a plain
  checkpoint.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp


def _walk_linears(tree, path=""):
    """Yield (path, subtree) for every linear param dict (kernel or
    qkernel), depth-first."""
    if isinstance(tree, Mapping):
        if "kernel" in tree or "qkernel" in tree:
            yield path, tree
        else:
            for k, v in tree.items():
                yield from _walk_linears(v, f"{path}/{k}" if path else k)


def _kernel_shape(sub) -> tuple:
    if "kernel" in sub:
        return tuple(sub["kernel"].shape)
    return tuple(sub["qkernel"].shape)  # QTensor/QTensor4/QTensorF8 .shape


def attach_lora(params: Any, rank: int, targets=("q_proj", "k_proj",
                "v_proj", "o_proj"), key=None, init_scale: float = 1.0):
    """Return a copy of ``params`` with lora_a/lora_b inserted into every
    linear whose path ends in one of ``targets``. B starts at zero, so the
    attached model is exactly the base model until the adapter trains or a
    real adapter is imported over it."""
    key = jax.random.PRNGKey(0) if key is None else key
    out = jax.tree_util.tree_map(lambda a: a, params)
    root = out.get("params", out) if isinstance(out, Mapping) else out
    n = 0
    for path, sub in _walk_linears(root):
        name = path.split("/")[-1]
        if name not in targets:
            continue
        shape = _kernel_shape(sub)
        if len(shape) != 2:
            continue  # stacked MoE experts: out of scope
        k_in, feats = shape
        key, sk = jax.random.split(key)
        sub["lora_a"] = (
            jax.random.normal(sk, (k_in, rank), jnp.float32)
            * (init_scale / jnp.sqrt(k_in))
        )
        sub["lora_b"] = jnp.zeros((rank, feats), jnp.float32)
        n += 1
    if n == 0:
        raise ValueError(f"no linears matched targets {targets!r}")
    return out


def import_hf_lora(sd: Mapping, params: Any) -> Any:
    """Load a PEFT adapter state dict over ``params`` (which must already
    have lora_a/lora_b slots of matching rank — attach_lora first).

    PEFT layout: ``base_model.model.model.layers.{i}.self_attn.q_proj.
    lora_A.weight`` [r, K] and ``lora_B.weight`` [N, r]; ours is
    lora_a [K, r], lora_b [r, N] — both transpose."""
    import numpy as np

    out = jax.tree_util.tree_map(lambda a: a, params)
    root = out.get("params", out) if isinstance(out, Mapping) else out
    loaded = 0
    for hf_name, w in sd.items():
        if ".lora_A." not in hf_name and ".lora_B." not in hf_name:
            continue
        # Strip any "base_model.model." / "model." prefixes, keep the path
        # from "layers.{i}" (or lm_head) onward.
        parts = hf_name.split(".")
        if "layers" in parts:
            parts = parts[parts.index("layers") :]
            node = root[f"layers_{parts[1]}"]
            proj_path = parts[2:-2]  # e.g. ["self_attn", "q_proj"]
        elif "lm_head" in parts:
            node = root
            proj_path = ["lm_head"]
        else:
            continue
        for p in proj_path:
            node = node[p]
        mat = jnp.asarray(np.asarray(w), jnp.float32).T
        slot = "lora_a" if ".lora_A." in hf_name else "lora_b"
        if slot not in node:
            raise ValueError(f"{hf_name}: attach_lora before importing")
        if node[slot].shape != mat.shape:
            raise ValueError(
                f"{hf_name}: rank mismatch {mat.shape} vs {node[slot].shape}"
            )
        node[slot] = mat
        loaded += 1
    if loaded == 0:
        raise ValueError("state dict contained no lora_A/lora_B tensors")
    return out


def merge_lora(fp_params: Any, alpha: float = 16.0) -> Any:
    """Fold adapters into fp kernels: W += A @ B * (alpha / r). Only valid
    on fp (unquantized) trees — merging into int8 payloads would re-quantize
    the sum, which is exactly what runtime LoRA avoids."""
    out = jax.tree_util.tree_map(lambda a: a, fp_params)
    root = out.get("params", out) if isinstance(out, Mapping) else out
    for _, sub in _walk_linears(root):
        if "lora_a" not in sub:
            continue
        if "kernel" not in sub:
            raise ValueError("merge_lora needs fp kernels (mode='fp' tree)")
        a, b = sub.pop("lora_a"), sub.pop("lora_b")
        r = a.shape[1]
        sub["kernel"] = (
            sub["kernel"].astype(jnp.float32) + (a @ b) * (alpha / r)
        ).astype(sub["kernel"].dtype)
    return out


# -- multi-LoRA (stacked adapters, per-request selection) ---------------------


def attach_lora_stack(params: Any, rank: int, n_adapters: int,
                      targets=("q_proj", "k_proj", "v_proj", "o_proj"),
                      key=None, init_scale: float = 1.0):
    """Insert STACKED adapters (lora_a [n, K, r], lora_b [n, r, N]) into
    every targeted linear. Every B starts at zero, so all n adapters begin
    as the base model; fill slots with ``set_stack_adapter``. Slot 0 is the
    reserved base-model adapter by convention (the engine assigns it to
    requests that name no adapter) — leave its B zero."""
    key = jax.random.PRNGKey(0) if key is None else key
    out = jax.tree_util.tree_map(lambda a: a, params)
    root = out.get("params", out) if isinstance(out, Mapping) else out
    n = 0
    for path, sub in _walk_linears(root):
        if path.split("/")[-1] not in targets:
            continue
        shape = _kernel_shape(sub)
        if len(shape) != 2:
            continue
        k_in, feats = shape
        key, sk = jax.random.split(key)
        sub["lora_a"] = (
            jax.random.normal(sk, (n_adapters, k_in, rank), jnp.float32)
            * (init_scale / jnp.sqrt(k_in))
        )
        sub["lora_b"] = jnp.zeros((n_adapters, rank, feats), jnp.float32)
        n += 1
    if n == 0:
        raise ValueError(f"no linears matched targets {targets!r}")
    return out


def set_stack_adapter(stacked_params: Any, idx: int, adapter_params: Any):
    """Copy a single-adapter tree's lora_a/lora_b (e.g. from attach_lora +
    import_hf_lora) into stack slot ``idx`` of a stacked tree."""
    out = jax.tree_util.tree_map(lambda a: a, stacked_params)
    root = out.get("params", out) if isinstance(out, Mapping) else out
    src_root = (
        adapter_params.get("params", adapter_params)
        if isinstance(adapter_params, Mapping)
        else adapter_params
    )
    src = {path: sub for path, sub in _walk_linears(src_root)}
    n = 0
    for path, sub in _walk_linears(root):
        if "lora_a" not in sub or sub["lora_a"].ndim != 3:
            continue
        if path not in src or "lora_a" not in src[path]:
            continue
        a, b = src[path]["lora_a"], src[path]["lora_b"]
        if a.shape != sub["lora_a"].shape[1:]:
            raise ValueError(
                f"{path}: adapter shape {a.shape} vs stack "
                f"{sub['lora_a'].shape[1:]}"
            )
        sub["lora_a"] = sub["lora_a"].at[idx].set(a)
        sub["lora_b"] = sub["lora_b"].at[idx].set(b)
        n += 1
    if n == 0:
        raise ValueError("no stacked adapter slots matched the source tree")
    return out
